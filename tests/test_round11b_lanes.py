"""Round-11b lane semantics: token accounting (q249), the packing
capacity sweep (q250), and cluster-balanced diversity selection (q251)
— the planning invariants beyond the oracle hash check."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from snowflake_cdc_spark.queries import queries
from tests.conftest import SF_SMOKE

import pytest

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow


def test_token_accounting_ledger_invariants(spark):
    qs = queries()
    rows = qs["q249_token_accounting"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).cast("bigint")
    ).first()[0]
    assert sum(r.u_tokens for r in rows) == total
    for r in rows:
        # diminishing returns never mint tokens
        assert r.effective_tokens <= r.alloc_tokens
        assert r.eff_epochs_ppm <= r.epochs_ppm
        # under the 4x-corpus uniform budget every source repeats
        if r.epochs_ppm > 1_000_000:
            assert r.wasted_ppm > 0
        # hyperbolic decay is bounded by 1 + R* extra epochs
        assert r.eff_epochs_ppm < 1_000_000 + 15_400_000
    # waste is monotone in repeats (floor jitter allowance of 5 ppm)
    by_epochs = sorted(rows, key=lambda r: r.epochs_ppm)
    for lo, hi in zip(by_epochs, by_epochs[1:]):
        assert hi.wasted_ppm >= lo.wasted_ppm - 5


def test_packing_sweep_monotone_and_q114_consistent(spark):
    qs = queries()
    rows = {r.capacity: r for r in qs["q250_packing_capacity_sweep"](
        spark, SF_SMOKE
    ).collect()}
    caps = sorted(rows)
    assert caps == [256, 512, 1024, 2048, 4096]
    for lo, hi in zip(caps, caps[1:]):
        # doubling capacities nest the boundary sets, so windows,
        # boundary-split docs and truncation loss are all non-increasing
        assert rows[hi].n_bins <= rows[lo].n_bins
        assert rows[hi].n_split_docs <= rows[lo].n_split_docs
        assert rows[hi].trunc_tokens <= rows[lo].trunc_tokens
    # the 2048 arm is exactly q114's ledger summed over its 16 buckets
    q114 = qs["q114_sequence_packing"](spark, SF_SMOKE).collect()
    assert rows[2048].n_bins == sum(r.n_bins for r in q114)
    assert rows[2048].n_split_docs == sum(r.n_split_docs for r in q114)
    assert rows[2048].pad_tokens == sum(r.pad_tokens for r in q114)


def test_diverse_selection_respects_quota_and_keeps_every_cell(spark):
    qs = queries()
    rows = qs["q251_diverse_selection"](spark, SF_SMOKE).collect()
    n = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    k = max(8, math.ceil(math.sqrt(n)))
    quota = ((n // 4) + k - 1) // k
    per_cell: dict[int, list[int]] = {}
    for r in rows:
        per_cell.setdefault(r.cell, []).append(r.rn)
    for cell, rns in per_cell.items():
        # contiguous ranks from 1, capped at the quota
        assert sorted(rns) == list(range(1, len(rns) + 1))
        assert max(rns) <= quota
    # the budget is spread: selected total is near N/4, never above
    # quota * live cells, and every selected vec_id is unique
    assert len({r.vec_id for r in rows}) == len(rows)
    assert len(rows) <= quota * len(per_cell)
    assert len(rows) >= min(n // 4, len(per_cell))


def test_unigram_segmentation_matches_independent_python_dp(spark):
    # third implementation: rebuild the Viterbi from q253's published
    # vocab in plain Python and check every q252 row's (cost, tokens)
    qs = queries()
    vocab = {
        r.piece: r.cost
        for r in qs["q253_unigram_vocab"](spark, SF_SMOKE).collect()
    }
    rows = qs["q252_unigram_segmentation"](spark, SF_SMOKE).collect()
    assert len(rows) > 100  # the planted pseudo-words make it corpus-sized
    INF = 10**12
    for r in rows:
        w = r.word
        best = [(0, 0)] + [(INF * 32, 0)] * len(w)
        for i in range(1, len(w) + 1):
            cands = []
            for l in range(1, min(4, i) + 1):
                c = vocab.get(w[i - l : i])
                if c is None:
                    c = INF
                pc, pt = best[i - l]
                cands.append((pc + c, pt + 1))
            best[i] = min(cands)  # (cost, tokens) lexicographic
        cost, ntok = best[len(w)]
        assert (r.cost_unats, r.n_tokens) == (cost, ntok), w
    # every word is segmentable (single-char closure)
    assert all(r.cost_unats < 10**12 for r in rows)


def test_unigram_vocab_contract(spark):
    qs = queries()
    rows = qs["q253_unigram_vocab"](spark, SF_SMOKE).collect()
    pieces = {r.piece for r in rows}
    # closure: every single character that appears in any piece is
    # itself a vocab piece
    assert {ch for p in pieces for ch in p} <= pieces
    # costs are -ln(cnt/total) in micro-nats: monotone decreasing in cnt
    by_cnt = sorted(rows, key=lambda r: r.cnt)
    for lo, hi in zip(by_cnt, by_cnt[1:]):
        assert hi.cost <= lo.cost
    assert all(r.cost > 0 for r in rows)
    assert all(1 <= len(r.piece) <= 4 for r in rows)


def test_unigram_fertility_reconciles_with_segmentation(spark):
    # per-source word/token totals must reconcile exactly with the
    # word-level segmentation: sum over sources == sum over words
    qs = queries()
    seg = qs["q252_unigram_segmentation"](spark, SF_SMOKE).collect()
    fer = qs["q254_unigram_fertility"](spark, SF_SMOKE).collect()
    assert sum(r.n_words for r in fer) == sum(r.n_occurrences for r in seg)
    assert sum(r.n_tokens for r in fer) == sum(
        r.n_occurrences * r.n_tokens for r in seg
    )
    for r in fer:
        # at least one token per word, at most MAX_WLEN
        assert 1_000_000 <= r.fertility_ppm <= 12_000_000
        assert r.mean_cost_unats > 0
        # integer-division consistency of the ppm ledger
        assert r.fertility_ppm == r.n_tokens * 1_000_000 // r.n_words


def test_curriculum_schedule_contract(spark):
    qs = queries()
    rows = qs["q255_curriculum_schedule"](spark, SF_SMOKE).collect()
    phases = sorted({r.train_order for r in rows})
    assert phases == [1, 2, 3, 4]
    # equal-mass phases: doc counts differ by at most 1 across phases
    per_phase_docs = {
        p: sum(r.n_docs for r in rows if r.train_order == p) for p in phases
    }
    assert max(per_phase_docs.values()) - min(per_phase_docs.values()) <= 1
    # shares within a phase sum to ~1e6 (integer-floor rounding down)
    for p in phases:
        s = sum(r.share_ppm for r in rows if r.train_order == p)
        n_src = sum(1 for r in rows if r.train_order == p)
        assert 1_000_000 - n_src <= s <= 1_000_000
    # cumulative schedule is monotone and ends at the corpus total
    cums = [
        max(r.cum_tokens for r in rows if r.train_order == p) for p in phases
    ]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r.tokens for r in rows)


def test_unigram_pieces_reconstruct_words_and_match_q252(spark):
    qs = queries()
    pieces = qs["q256_unigram_pieces"](spark, SF_SMOKE).collect()
    seg = {
        r.word: (r.cost_unats, r.n_tokens)
        for r in qs["q252_unigram_segmentation"](spark, SF_SMOKE).collect()
    }
    vocab = {
        r.piece for r in qs["q253_unigram_vocab"](spark, SF_SMOKE).collect()
    }
    assert len(pieces) == len(seg)
    for r in pieces:
        ps = r.segmentation.split(" ")
        # the pieces concatenate back to the word, count matches, and
        # every piece is in the vocabulary
        assert "".join(ps) == r.word
        assert len(ps) == r.n_tokens
        assert set(ps) <= vocab
        # the path's (cost, tokens) equals the q252 optimum
        assert (r.cost_unats, r.n_tokens) == seg[r.word]


def test_unigram_em_round_contract(spark):
    qs = queries()
    card = qs["q257_unigram_em_round"](spark, SF_SMOKE).collect()
    seg = qs["q252_unigram_segmentation"](spark, SF_SMOKE).collect()
    # usage reconciles with the segmentation: total piece uses ==
    # occurrence-weighted token count
    assert sum(r.used for r in card) == sum(
        r.n_occurrences * r.n_tokens for r in seg
    )
    kept = [r for r in card if r.kept]
    dropped = [r for r in card if not r.kept]
    assert kept and dropped  # hard-EM genuinely prunes something
    assert all(r.cost1 is not None and r.cost1 > 0 for r in kept)
    assert all(r.cost1 is None and r.used == 0 for r in dropped)
    # re-estimated costs are monotone in usage
    by_used = sorted(kept, key=lambda r: r.used)
    for lo, hi in zip(by_used, by_used[1:]):
        assert hi.cost1 <= lo.cost1
