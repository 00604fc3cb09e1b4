"""Script-aware language-ID (VERDICT r09 #6): the planted rows prove
q29's legacy router mislabels non-Latin scripts as 'zh', and the new
script-first router fixes exactly those rows without disturbing the
Latin stopword path."""

from __future__ import annotations

from snowflake_cdc_spark.queries_round10_ext import q243
from tests.conftest import SF_SMOKE


def test_legacy_mislabels_cyrillic_new_router_fixes_it(spark):
    rows = q243(spark, SF_SMOKE).collect()
    by_key = {
        (r["true_lang"], r["script"], r["predicted_lang"], r["legacy_lang"]):
            r["n_docs"]
        for r in rows
    }
    # the planted Cyrillic rows: legacy says 'zh' (the mislabel), the
    # script-aware router says 'ru'
    assert by_key.get(("ru", "cyrillic", "ru", "zh"), 0) > 0
    # no Cyrillic-truth row is ever predicted anything but 'ru'
    assert all(
        k[2] == "ru" for k in by_key if k[0] == "ru"
    )
    # planted CJK rows route to 'zh' through the script bucket
    assert by_key.get(("zh", "cjk", "zh", "zh"), 0) > 0
    # Latin docs keep the q29 stopword behavior: wherever the legacy
    # lane found stopword evidence, the new router agrees
    for (_t, script, pred, legacy), n in by_key.items():
        if script == "latin" and legacy in ("en", "es", "de", "fr"):
            assert pred == legacy, (script, pred, legacy, n)
    # and the fake-'zh' fallback is gone: a no-evidence Latin doc is 'und'
    assert all(
        pred != "zh"
        for (_t, script, pred, _l) in by_key
        if script == "latin"
    )
