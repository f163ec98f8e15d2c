"""Transcript-table queries (the BASELINE.json input_hint shape) against
the DuckDB oracle at sf0.001 — exercises per-turn scrub parity, pair-level
distinct-conversation combiners, conv-keyed window adjacency, and
whole-conversation dedup over the generated transcript shards."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

NAMES = [
    "transcript_scrub",
    "transcript_role_stats",
    "transcript_tool_usage",
    "transcript_conv_stats",
    "transcript_role_transitions",
    "transcript_turn_gaps",
    "conv_lookup",
    "turn_dedup",
    "conv_dedup",
    "transcript_tool_chains",
    "conv_context_truncate",
    "conv_role_balance",
    "transcript_contamination",
    "transcript_loop_detect",
    "turn_context_window",
    "conv_pack_assign",
    "transcript_sessionize",
    "conv_exchange_extract",
    "dpo_pairs",
    "transcript_refusals",
    "session_turn_dedup",
    "transcript_validation",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", NAMES)
def test_transcript_query_matches_duckdb(ray_session, monkeypatch, name):
    import __ray_entry__ as E

    # the transcript oracle resolves its fixture size from this env var
    monkeypatch.setenv("GRAFT_ORACLE_SF_DIR", SF)
    got = _canon(E.queries()[name](SF).to_pandas())
    want = _canon(duckdb.connect().execute(E.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
