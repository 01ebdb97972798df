"""Round-12 optimization: fused decode+aHash operators must be
bit-identical to the channel-vector path they replaced (the plans'
old transform/aggregate SQL chain, replayed here as plain integer
arithmetic over the channel operators' output)."""

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.operators.multimodal import (
    avi_frame_ahash32,
    avi_frame_channels,
    bmp_ahash32,
    bmp_pixel_channels,
)
from rust_ruuvitag_etl_spark.plans.llm23 import _AH_BRIGHT, _ah_media
from rust_ruuvitag_etl_spark.plans.llm24 import _VID_FRAMES, _vid_media
from rust_ruuvitag_etl_spark.sources import load

SF_SMALL = "/root/testdata/sf0.001"


def _ahash_from_channels(channels):
    """The exact integer semantics of the replaced SQL chain: lum_p =
    ch[3p]+ch[3p+1]+ch[3p+2]; bit p = lum_p * n_pixels > total."""
    lums = [
        channels[3 * p] + channels[3 * p + 1] + channels[3 * p + 2]
        for p in range(len(channels) // 3)
    ]
    total = sum(lums)
    return sum(
        1 << p for p, l in enumerate(lums) if l * len(lums) > total
    )


class TestFusedAhashParity:
    def test_bmp_ahash32_matches_channel_path(self, spark):
        ev = load(spark, SF_SMALL, "events").select("event_id").limit(16)
        media = _ah_media(ev, F.col("event_id"), _AH_BRIGHT)
        want = {
            r["media_id"]: _ahash_from_channels(r["channels"])
            for r in bmp_pixel_channels(media).collect()
        }
        got = {r["media_id"]: r["fh"] for r in bmp_ahash32(media).collect()}
        assert got == want and len(got) == 16

    def test_avi_frame_ahash32_matches_channel_path(self, spark):
        ev = load(spark, SF_SMALL, "events").select("event_id").limit(4)
        media = _vid_media(ev, F.col("event_id"), 0, 0, _VID_FRAMES)
        want = {
            (r["media_id"], r["frame_no"]): _ahash_from_channels(
                r["channels"]
            )
            for r in avi_frame_channels(media).collect()
        }
        got = {
            (r["media_id"], r["frame_no"]): r["fh"]
            for r in avi_frame_ahash32(media).collect()
        }
        assert got == want and len(got) == 4 * _VID_FRAMES
