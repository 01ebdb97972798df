"""Round-10 wave 8 — multimodal (image) near-duplicate detection.

The missing modality in the dedup story: text has MinHash/SimHash/
SSJoin, embeddings have RHP-LSH and SemDeDup — this family dedups
IMAGES with the real codec in the loop. Corpus: genuine 3x2 24-bit
BI_RGB BMPs (the multimodal_image_stats packer, shared via
bmp_payload_hex_from_channels) whose 18 channel values mix the image
id through the portable md5 hash — so every image is globally unique,
unlike the stats corpus whose (id x prime) mod 256 channels collapse
into 256 exact-duplicate classes (measured: that corpus yields a
quadratic N^2/256 pair set — correct, but a different, degenerate
workload). A planted near-duplicate joins every 7th image (pixel 0's
red channel +1 — an off-by-one requantization artifact).

The engine path DECODES every blob with the stdlib BMP parser inside
Arrow mapInPandas, blocks on TWO offset quantization bands, and
verifies candidates with an exact integer L1 distance; the oracle
reproduces the decoded channels arithmetically (h60 twin), so a hash
match proves pack → parse → un-flip → block → verify end to end.

Why two bands at offsets 0 and 2 (channel // 4 and (channel+2) // 4):
a +1 perturbation crosses an offset-0 bucket boundary only when the
channel ≡ 3 (mod 4) and an offset-2 boundary only when ≡ 1 (mod 4) —
never both — so every planted pair collides in AT LEAST one band:
recall is 1.0 BY CONSTRUCTION, not by tuning (the wrap case 255→0 is
rejected by the L1 verifier identically on both engines). md5-mixed
channels quantize to ~unique 18-value keys, so non-planted collisions
are negligible and the candidate space is O(|planted|), never
quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import multimodal as mm
from ..operators.dedup import spread
from ..sources import load
from .analytics import bmp_payload_hex_from_channels
from .registry import query

_IMG_COPY_MOD = 7
_IMG_L1_MAX = 3  # planted diff is exactly 1; wrap pairs (255) rejected


def _chan_sql(i: int, bump: bool) -> str:
    h = tf.h60_sql(f"'img:{i}:' || CAST(e AS VARCHAR)")
    base = f"({h}) % 256"
    return f"(({base}) + bump) % 256" if bump else base


_IMG_DEDUP_ORACLE = f"""
WITH ids AS (
    SELECT event_id AS mid, event_id AS e, 0 AS bump FROM events
    UNION ALL
    -- planted-copy ids live in the NEGATIVE keyspace: disjoint from
    -- base event_ids (>= 0) at EVERY scale factor, unlike an additive
    -- offset which collides once event_id reaches it
    SELECT -(event_id + 1), event_id, 1 FROM events
    WHERE event_id % {_IMG_COPY_MOD} = 0
),
ch AS (
    SELECT mid,
           [{", ".join(_chan_sql(i, bump=(i == 0)) for i in range(18))}]
               AS ch
    FROM ids
),
bands AS (
    SELECT mid, 0 AS band,
           array_to_string(list_transform(ch, c -> CAST(c // 4 AS VARCHAR)),
                           ',') AS bk
    FROM ch
    UNION ALL
    SELECT mid, 1,
           array_to_string(list_transform(ch,
                           c -> CAST((c + 2) // 4 AS VARCHAR)), ',')
    FROM ch
),
cand AS (
    SELECT DISTINCT a.mid AS id_a, b.mid AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bk = b.bk AND a.mid < b.mid
),
verified AS (
    SELECT c.id_a, c.id_b,
           CAST(list_sum(list_transform(range(1, 19),
                i -> abs(ca.ch[i] - cb.ch[i]))) AS BIGINT) AS l1
    FROM cand c
    JOIN ch ca ON ca.mid = c.id_a
    JOIN ch cb ON cb.mid = c.id_b
)
SELECT id_a, id_b, l1 FROM verified WHERE l1 <= {_IMG_L1_MAX}
"""


def _channels(e, bump: bool) -> list:
    out = []
    for i in range(18):
        c = F.pmod(
            tf.h60(F.concat(F.lit(f"img:{i}:"), e.cast("string"))),
            F.lit(256),
        )
        if i == 0 and bump:
            c = F.pmod(c + 1, F.lit(256))
        out.append(c)
    return out


def _media(ev: DataFrame, mid, bump: bool) -> DataFrame:
    ch = _channels(F.col("event_id"), bump)
    pixels = [tuple(ch[3 * p + k] for k in range(3)) for p in range(6)]
    return ev.select(
        mid.alias("media_id"),
        F.unhex(bmp_payload_hex_from_channels(pixels)).alias("content"),
    )


@query("dedup_image_bands", oracle=_IMG_DEDUP_ORACLE)
def dedup_image_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs over REAL decoded BMPs: pack the
    md5-channel corpus (+ planted every-7th near-copies, red channel
    +1) into genuine bitmaps, DECODE each with the stdlib BI_RGB
    parser inside Arrow mapInPandas, block on two offset quantization
    bands (recall 1.0 on ±1 perturbations by construction — module
    docstring), and verify candidates with an exact integer L1
    distance. The oracle reproduces the decoded channels
    arithmetically, so a hash match proves the full pack → parse →
    block → verify chain.

    Scale posture: pack + decode + banding are scan-local; the ONE
    corpus-scale shuffle is the band-key equi-join (md5-mixed channels
    make keys ~unique for non-duplicates, so bucket sizes stay O(1)
    and the candidate space is O(|planted|)); the L1 verify joins the
    candidate ids back to the channel table by id — uniform
    equi-joins, never a cross join. At photo scale the same plan runs
    over perceptual-hash bands (aHash/pHash bits) instead of
    raw-channel quantization — identical shape."""
    ev = spread(load(spark, sf_dir, "events").select("event_id"))
    base = _media(ev, F.col("event_id"), bump=False)
    copies = _media(
        ev.filter(F.col("event_id") % _IMG_COPY_MOD == 0),
        -(F.col("event_id") + 1),
        bump=True,
    )
    # REAL decode of every blob; |corpus + planted| rows of
    # (media_id, 18-channel vector), reused by banding AND verify.
    ch = mm.bmp_pixel_channels(base.unionAll(copies)).localCheckpoint(
        eager=True
    )

    def band(offset: int, band_id: int) -> DataFrame:
        # Engine-side the band key is a 64-bit hash of the quantized
        # 18-value vector, NOT the vector's CSV rendering: the self-
        # join shuffles 8 bytes per row instead of a ~70-byte string
        # (measured 12.5 MB -> ~1 MB shuffle write at sf0.1). A hash
        # collision can only ADD a candidate pair; the verify stage
        # re-checks TRUE quantized band equality (not the hash) on the
        # surviving pairs, so the ~2^-64 cross-key collision residual
        # is eliminated exactly, not just probabilistically — output
        # provably identical to the oracle's readable CSV keys.
        key = F.xxhash64(
            F.transform(
                "channels",
                lambda c: ((c + F.lit(offset)) / 4).cast("int"),
            )
        )
        return ch.select(
            "media_id", F.lit(band_id).alias("band"), key.alias("bk")
        )

    bands = band(0, 0).unionAll(band(2, 1))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
        )
        .distinct()
    )
    ca = ch.select(
        F.col("media_id").alias("id_a"), F.col("channels").alias("_ca")
    )
    cb = ch.select(
        F.col("media_id").alias("id_b"), F.col("channels").alias("_cb")
    )
    l1 = F.aggregate(
        F.zip_with("_ca", "_cb", lambda x, y: F.abs(x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )

    # Exact-equivalence guard for the hashed band key: re-check TRUE
    # quantized band-vector equality on the candidate pairs (O(|cand|)
    # array compares, no extra shuffle), so an xxhash64 cross-key
    # collision on a pair at L1 <= _IMG_L1_MAX can never emit a row
    # the CSV-keyed oracle lacks.
    def _qeq(offset: int):
        q = lambda col: F.transform(  # noqa: E731
            col, lambda c: ((c + F.lit(offset)) / 4).cast("int")
        )
        return q("_ca") == q("_cb")

    return (
        cand.join(ca, "id_a")
        .join(cb, "id_b")
        .filter(_qeq(0) | _qeq(2))
        .select("id_a", "id_b", l1.alias("l1"))
        .filter(F.col("l1") <= _IMG_L1_MAX)
    )
