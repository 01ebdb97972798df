"""Fresh-JVM-per-query median probe — the adjudication protocol for
bench-suite regressions, as a committed command instead of round-lore.

Why it exists (PLANS.md "Bench-suite reading discipline", round 10):
the headline suite times ~80 queries in ONE JVM; back-to-back runs on
an idle box showed the suite TAIL reading 20-30% above fresh-JVM
medians and one run mispricing a mid-suite entry 3x. Suite numbers
BOUND a query's cost; a suite-to-suite delta is only a regression if
this protocol reproduces it: each query gets its OWN JVM (subprocess),
a warm pass, then the median of N timed reps with bench's reclaim
discipline between reps. The parent also reports bench's contention
sentinel before and after — readings taken at calibration_s > ~0.2
(1.3x the ~0.15 idle reference) are themselves suspect.

Uses the same OVERRIDES map as bench.py so probe-only ANN paths are
measured exactly as the headline measures them.

Usage: python tools/fresh_jvm_probe.py [sf_dir] query [query ...]
Output: one "<median>s  <query>  reps=[...]" line per query, plus
calibration lines; machine-readable JSON on the last line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_REPS = 3
# CPU-bound plans (md5-hash shingling, codec decode) ride a long C2
# JIT warm-up curve in a fresh JVM: measured on contamination_ngram_
# eval at sf0.1, rep0 12.4 s -> rep1 2.5 -> rep3 1.65 -> steady 1.6 s.
# ONE warm rep lands mid-curve and over-reads the query ~2x; three
# warm reps reach steady state. Override with PROBE_WARM if needed.
_WARM = int(os.environ.get("PROBE_WARM", "3"))


def _child(sf_dir: str, name: str) -> None:
    from bench import OVERRIDES, _reclaim
    from rust_ruuvitag_etl_spark.plans import REGISTRY
    from rust_ruuvitag_etl_spark.session import get_spark

    spark = get_spark(f"probe-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = OVERRIDES.get(name, REGISTRY[name].fn)
    spark.range(1000).count()
    for _ in range(_WARM):  # codegen, footers, plan build, C2 JIT
        fn(spark, sf_dir).count()
        _reclaim(spark)
    reps = []
    for _ in range(_REPS):
        t0 = time.time()
        fn(spark, sf_dir).count()
        reps.append(round(time.time() - t0, 3))
        _reclaim(spark)
    print(
        "CHILD_RESULT "
        + json.dumps({"name": name, "median": sorted(reps)[len(reps) // 2],
                      "reps": reps})
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) < 2:
        print("usage: fresh_jvm_probe.py [sf_dir] query [query ...]")
        sys.exit(2)
    if sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3])
        return
    args = sys.argv[1:]
    # Only consume args[0] as sf_dir when it is a directory AND not a
    # registry query name — a query that happens to match a local dir
    # must not be silently eaten as the sf_dir.
    from rust_ruuvitag_etl_spark.plans import REGISTRY

    sf_dir = (
        args.pop(0)
        if args and os.path.isdir(args[0]) and args[0] not in REGISTRY
        else "/root/testdata/sf0.1"
    )
    if not args:
        print("usage: fresh_jvm_probe.py [sf_dir] query [query ...]")
        sys.exit(2)

    from bench import _calibration_s

    print(f"calibration_s(before) = {_calibration_s()}", flush=True)
    results = {}
    for name in args:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             sf_dir, name],
            capture_output=True, text=True, cwd=_REPO,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines()
             if ln.startswith("CHILD_RESULT ")),
            None,
        )
        if line is None:
            print(f"ERR {name}: {proc.stderr.strip()[-300:]}", flush=True)
            continue
        r = json.loads(line[len("CHILD_RESULT "):])
        results[name] = r
        print(f"{r['median']:7.2f}s  {name}  reps={r['reps']}", flush=True)
    print(f"calibration_s(after) = {_calibration_s()}", flush=True)
    print(json.dumps({n: r["median"] for n, r in results.items()}))


if __name__ == "__main__":
    main()
