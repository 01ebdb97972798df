"""One-off splice: star-axis rows for registry queries added to
scaling_probe.EXTRA after the round-12 full probe ran — same
methodology (one untimed warm pass per scale, median of 3), rows
inserted into SCALING.md's star table so no registry query ships
without a scaling posture. Future rounds regenerate the whole file
with these queries in EXTRA; this script then has no further use.

Usage: python tools/_splice_scaling_rows.py query [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import OVERRIDES, _reclaim  # noqa: E402
from rust_ruuvitag_etl_spark.plans import REGISTRY  # noqa: E402
from rust_ruuvitag_etl_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    names = sys.argv[1:]
    assert names, "usage: _splice_scaling_rows.py query [query ...]"
    spark = get_spark("scaling-splice")
    spark.sparkContext.setLogLevel("ERROR")
    rows = {}
    for name in names:
        fn = OVERRIDES.get(name, REGISTRY[name].fn)
        rows[name] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            fn(spark, sf_dir).count()  # warm
            _reclaim(spark)
            reps = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).count()
                reps.append(time.time() - t0)
                _reclaim(spark)
            rows[name][sf] = round(sorted(reps)[1], 3)
        print(name, rows[name], flush=True)
    spark.stop()

    md = os.path.join(_REPO, "SCALING.md")
    with open(md) as f:
        lines = f.read().splitlines()
    anchor = next(
        i for i, ln in enumerate(lines)
        if ln.startswith("Worst star-axis exponent")
    )
    new = []
    for name in names:
        t1, t2, t3 = (rows[name][sf] for sf in SFS)
        exp = math.log10(t3 / t2)
        new.append(f"| {name} | {t1} | {t2} | {t3} | {exp:+.2f} |")
    # table ends one blank line above the anchor
    lines[anchor - 1 : anchor - 1] = new
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"spliced {len(new)} rows into SCALING.md")


if __name__ == "__main__":
    main()
