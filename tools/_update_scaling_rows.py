"""Replace SCALING.md star-axis rows for queries whose PLANS changed
this round — same methodology as tools/scaling_probe.py (one untimed
warm pass per scale, median of 3, exponent = log10(t_0.1/t_0.01)) but
scoped to the named queries so a plan optimization's scaling posture
is re-measured without re-running the full three-scale probe.

Usage: python tools/_update_scaling_rows.py query [query ...]
"""

from __future__ import annotations

import math
import os
import re
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
    assert names, "usage: _update_scaling_rows.py query [query ...]"
    spark = get_spark("scaling-update")
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
    replaced = set()
    for i, ln in enumerate(lines):
        m = re.match(r"\| (\S+) \| ", ln)
        if not m or m.group(1) not in rows:
            continue
        name = m.group(1)
        t1, t2, t3 = (rows[name][sf] for sf in SFS)
        exp = math.log10(t3 / t2)
        lines[i] = f"| {name} | {t1} | {t2} | {t3} | {exp:+.2f} |"
        replaced.add(name)
    missing = set(rows) - replaced
    if missing:
        print(f"WARNING: no existing SCALING.md row for {sorted(missing)}")
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"replaced {len(replaced)} rows in SCALING.md")


if __name__ == "__main__":
    main()
