#!/usr/bin/env python
"""Round-11b probe: the unigram-tokenizer lanes (q253 vocab build,
q252 Viterbi segmentation, q254 per-source fertility) timed at
sf0.1 / 10x / 100x on the round-10 weak-scaling fixtures.

What the fixtures exercise: the x-N documents replicate sf0.1 with a
per-replica word mutation ('q<r>' appended to every [a-z]+ run) plus
one planted pseudo-word per doc_id, so the DISTINCT-word relation —
the unit of the Viterbi DP — grows ~linearly with the multiplier
(the 100-TB shape: per-occurrence work never happens; the DP cost
tracks vocabulary growth, which is sublinear in corpus bytes for real
corpora and linear here by construction, the worst case).

Linear-decade claim to check: exp ~ 1.0 per decade for all three
lanes (the vocab build is one groupBy + a parameter-bounded collect;
the DP is a per-row expression over distinct words; fertility adds a
(source, word) groupBy + hash join, both linear).

Method mirrors tools/probe_round10.py: min-of-2 warm, 600 s cap.
Results go to docs/PLANS.md round-11.

Usage: python tools/probe_round11b.py [q252 q253 q254 ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.probe_round10 import CAP_S, SF01, build_fixture  # noqa: E402


def _lane(name):
    def run(spark, sf_dir):
        from snowflake_cdc_spark import queries as q

        return q.queries()[name](spark, sf_dir)

    return run


LANES = {
    "q253": _lane("q253_unigram_vocab"),
    "q252": _lane("q252_unigram_segmentation"),
    "q254": _lane("q254_unigram_fertility"),
    "q256": _lane("q256_unigram_pieces"),
    "q257": _lane("q257_unigram_em_round"),
}


def time_lane(fn, spark, sf_dir) -> float | None:
    best = None
    for rep in range(2):
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if rep == 0 and dt > CAP_S:
            return None
    return best


def main(argv: list[str]) -> int:
    from snowflake_cdc_spark.session import get_spark

    d10 = build_fixture(10)
    d100 = build_fixture(100)
    spark = get_spark(app_name="probe_round11b")
    names = argv or list(LANES)
    print(
        f"{'lane':12s} {'sf0.1':>8s} {'10x':>8s} {'100x':>8s} "
        f"{'exp1':>6s} {'exp2':>6s}"
    )
    for name in names:
        fn = LANES[name]
        t1 = time_lane(fn, spark, SF01)
        t10 = time_lane(fn, spark, d10) if t1 is not None else None
        t100 = time_lane(fn, spark, d100) if t10 is not None else None

        def _f(v):
            return f"{v:8.2f}" if v is not None else " TIMEOUT"

        e1 = (
            f"{math.log10(t10 / t1):6.2f}"
            if t1 and t10
            else "  >1.5" if t1 else "     ?"
        )
        e2 = (
            f"{math.log10(t100 / t10):6.2f}"
            if t10 and t100
            else "  >1.5" if t10 else "     ?"
        )
        print(f"{name:12s} {_f(t1)} {_f(t10)} {_f(t100)} {e1} {e2}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
