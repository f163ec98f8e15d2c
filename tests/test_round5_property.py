"""Randomized cross-engine property check for the round-5 documents-table
operators: generate adversarial synthetic documents (nulls, unicode,
NBSP, newlines, repeated spaces, planted PII, single-token and empty
texts), run BOTH the Ray query and its DuckDB oracle on the same table,
and require the canonicalized results to match — the sf-fixture gates
never contain null text or NBSP, so this is the only check that
exercises those edges end-to-end."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pathlib import Path

# documents-only, SQL-verified operators with deterministic-exact
# semantics (transcript/events ones need their own generated fixtures
# and are covered by the sf gates; word_heavy_hitters legitimately
# REFUSES tiny inputs it cannot certify; dedup_incremental_bloom is
# superset-semantics by design).  This harness caught three real
# divergences the null-free sf fixtures never could: DuckDB trim()
# strips NBSP while utf8_trim(' ') keeps it, bare `text` in oracles
# propagated SQL NULL where the Ray kernels fill_null('') — in
# quality word_chars, the scrub chain, chunk substring, and the
# incremental-dedup NOT EXISTS equality.
OPS = ["dedup_keep_best", "pii_leak_report", "token_length_histogram",
       "domain_reweight", "code_fence_stats", "length_stratified_split",
       "redpajama_signals", "source_lang_entropy",
       "doc_quality", "doc_scrub", "doc_tokens", "doc_stopwords",
       "dedup_exact", "dedup_normalized", "line_dedup", "para_dedup",
       "doc_entropy", "doc_repetition", "doc_dup_ngrams", "word_counts",
       "corpus_datacard", "doc_chunks", "bigram_pmi", "source_kl",
       "doc_validation", "dedup_incremental", "dedup_indexed",
       "dedup_jaccard", "doc_length_minmax_by_lang",
       "doc_length_quantiles_by_lang", "distinct_words_by_lang",
       "docs_per_source_cap", "clean_corpus_stats", "lang_hist",
       "source_stats", "ngram_counts", "doc_tfidf", "corpus_mix",
       "doc_budget_selection", "doc_length_topp", "gopher_filter",
       "stratified_sample", "doc_split", "doc_shuffle",
       "doc_length_pctrank", "doc_length_rank", "inverted_index",
       "distinct_words_exact", "word_counts_by_lang",
       "lang_temperature_mix", "weighted_sample", "substring_dedup",
       "contamination"]

_WORDS = ["the", "café", "日本語", "naïve", "x", "", "alpha-beta",
          "line.", "Ends!", "mail bob@example.com now", "1.2.3.4",
          "123-45-6789", "4111 1111 1111 1111", "damn", "word?",
          " ", "tab\tsep", "emoji🎉", "ALLCAPS", "123"]


def _random_docs(rng: np.random.Generator, n: int) -> pa.Table:
    texts = []
    for i in range(n):
        kind = rng.integers(0, 8)
        if kind == 0:
            texts.append(None)
        elif kind == 1:
            texts.append("")
        elif kind == 2:
            texts.append(str(rng.choice(_WORDS)))  # single token
        else:
            k = int(rng.integers(1, 30))
            words = [str(w) for w in rng.choice(_WORDS, size=k)]
            sep = rng.choice([" ", "  ", "\n", " \n "])
            texts.append(str(sep).join(words))
    # duplicate some texts verbatim and near-verbatim so keep-best has
    # real groups
    for i in range(0, n, 7):
        j = int(rng.integers(0, n))
        if texts[j] is not None:
            texts[i] = texts[j].upper() if rng.integers(2) else texts[j]
    langs = rng.choice(["en", "de", "ja", "xx"], size=n)
    sources = rng.choice(["web", "books", "code"], size=n)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([str(x) for x in langs]),
        "source": pa.array([str(x) for x in sources]),
        "n_chars": pa.array([len(t) if t else 0 for t in texts],
                            pa.int64())})


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns),
                          ignore_index=True).round(6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_round5_docs_ops_match_oracle_on_adversarial_input(
        ray_session, tmp_path, seed):
    import __ray_entry__ as E
    rng = np.random.default_rng(seed)
    docs = _random_docs(rng, 120)
    d = tmp_path / f"rand{seed}"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    oracles = E.oracle_sql()
    qs = E.queries()
    for name in OPS:
        got = qs[name](str(d))
        if not isinstance(got, (pa.Table, pd.DataFrame)):
            got = got.to_pandas()
        elif isinstance(got, pa.Table):
            got = got.to_pandas()
        want = con.execute(oracles[name]).df()
        a, b = _canon(got), _canon(want)
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      obj=f"{name} (seed {seed})")


EVENT_OPS = ["events_sessions", "events_hourly", "events_stats",
             "events_lag", "events_sliding", "events_cumsum",
             "events_funnel", "events_funnel_count", "events_retention",
             "events_top_spenders", "events_last_per_user",
             "events_value_salted", "events_rollup", "events_pivot",
             "events_attribution", "events_dau", "events_anomaly_zscore"]


def _random_events(rng: np.random.Generator, n: int) -> pa.Table:
    """Heavy exact-timestamp ties, one hot user, negative values —
    the tie-break and skew edges the fixture's smooth event stream
    never produces."""
    base = np.int64(1_700_000_000_000_000)
    ts = (base + rng.integers(0, 50, n) * np.int64(3_600_000_000)
          + rng.integers(0, 4, n) * np.int64(60_000_000))
    users = rng.choice([1, 2, 3, 42, 42, 42, 99], size=n)
    et = rng.choice(["view", "click", "purchase", "signup", "error"], n)
    val = np.round(rng.normal(0, 50, n), 2)
    props = rng.choice(["", "a=1", "x", "long" * 10], n)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(users.astype(np.int64)),
        "event_type": pa.array([str(x) for x in et]),
        "value": pa.array(val),
        "props": pa.array([str(x) for x in props])})


@pytest.mark.parametrize("seed", [0, 1])
def test_events_ops_match_oracle_on_tied_skewed_input(
        ray_session, tmp_path, seed):
    import __ray_entry__ as E
    rng = np.random.default_rng(seed)
    ev = _random_events(rng, 400)
    d = tmp_path / f"ev{seed}"
    d.mkdir()
    pq.write_table(ev, d / "events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    oracles = E.oracle_sql()
    qs = E.queries()
    for name in EVENT_OPS:
        got = qs[name](str(d))
        if not isinstance(got, (pa.Table, pd.DataFrame)):
            got = got.to_pandas()
        elif isinstance(got, pa.Table):
            got = got.to_pandas()
        want = con.execute(oracles[name]).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False,
                                      obj=f"{name} (seed {seed})")


# transcript-table ops: the fixture generator is monkeypatched so BOTH
# engines read the same random shards.  Excluded: conv_lookup (targets
# a fixture-specific conv id — empty-vs-empty on random data),
# turn_context_window (rolling_join documents a DENSE-ordinal contract
# and now raises a clear ValueError on sparse input — tested below),
# weighted_sample_by_lang (reads the documents table).
TRANSCRIPT_OPS = [
    "conv_context_truncate", "conv_exchange_extract", "conv_pack_assign",
    "conv_response_latency", "conv_role_balance", "dpo_pairs",
    "session_turn_dedup", "transcript_contamination",
    "transcript_conv_stats", "transcript_loop_detect",
    "transcript_refusals", "transcript_role_stats",
    "transcript_role_transitions", "transcript_scrub",
    "transcript_sessionize", "transcript_tool_chains",
    "transcript_tool_usage", "transcript_turn_gaps",
    "transcript_validation", "conversations_assembled", "turn_dedup",
    "conv_dedup", "repeated_prefix_convs", "conv_duration_stats",
    "turn_length_quantiles_by_role"]


def _random_transcripts(rng: np.random.Generator, n_convs: int) -> pa.Table:
    """Sparse/gapped turn ordinals, convs NOT starting at 0, system and
    tool roles, null/empty/NBSP texts, exact-timestamp ties — this
    caught the idx==0 sessionize seed bug and the dpo_pairs empty-block
    crash that three fixture-green rounds never could."""
    rows = []
    base = np.int64(1_700_000_000_000_000)
    for c in range(n_convs):
        conv = f"rc{c:05d}"
        n = int(rng.integers(1, 12))
        start = base + int(rng.integers(0, 1000)) * np.int64(60_000_000)
        idxs = sorted(rng.choice(np.arange(0, n * 3), size=n,
                                 replace=False).tolist())
        if rng.integers(3) == 0:
            idxs[0] = 0
        for k, ti in enumerate(idxs):
            role = str(rng.choice(["user", "assistant", "system", "tool"]))
            kind = rng.integers(0, 6)
            text = (None if kind == 0 else "" if kind == 1 else
                    str(rng.choice(["I cannot help with that.",
                                    "hello  world", "damn", "ok",
                                    "mail bob@example.com", "日本語 です",
                                    "a\nb", "repeat repeat repeat repeat",
                                    "\xa0 nbsp"])))
            tool = str(rng.choice(["", "", "", "search", "code"]))
            ts = start + k * np.int64(rng.choice([0, 1, 60]) * 1_000_000)
            rows.append((conv, ti, role, text, tool, ts))
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows], pa.large_string()),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([int(r[5]) for r in rows]).cast(pa.timestamp("us"))})


@pytest.mark.parametrize("seed", [0])
def test_transcript_ops_match_oracle_on_sparse_gapped_input(
        ray_session, tmp_path, monkeypatch, seed):
    import __ray_entry__ as E
    rng = np.random.default_rng(seed)
    tt = _random_transcripts(rng, 60)
    d = tmp_path / f"tr{seed}"
    d.mkdir()
    pq.write_table(tt, d / "part-00000.parquet")
    pq.write_table(tt.slice(0, 0), d / "part-00001.parquet")  # empty shard
    monkeypatch.setattr(E, "_transcripts_for_sf", lambda sf_dir: d)
    con = duckdb.connect()
    oracles = E.oracle_sql()
    qs = E.queries()
    for name in TRANSCRIPT_OPS:
        got = qs[name]("UNUSED")
        if not isinstance(got, (pa.Table, pd.DataFrame)):
            got = got.to_pandas()
        elif isinstance(got, pa.Table):
            got = got.to_pandas()
        want = con.execute(oracles[name]).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False,
                                      obj=f"{name} (seed {seed})")


def test_rolling_join_sparse_ordinals_fail_loudly(ray_session):
    """rolling_join's dense-ordinal contract violation must surface as
    a clear ValueError, not an ArrowIndexError deep in a worker."""
    import ray.data
    from lingua_ray.stages.adjacency import rolling_join
    t = pa.table({"k": ["a"] * 3, "o": pa.array([3, 7, 9], pa.int64()),
                  "text": ["x", "y", "z"]})
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="DENSE 0-based"):
        rolling_join(ds, "k", "o", "text", k=2).materialize()


TPCH_OPS = ["orders_by_segment", "orders_join_customer",
            "lineitem_pricing", "lineitem_revenue_filter",
            "orders_price_quantiles", "orders_price_bands",
            "orders_price_bands_bucketed", "orders_price_zscore",
            "top_orders_per_segment", "supplier_revenue",
            "local_supplier_volume", "top_unshipped_orders",
            "customers_no_big_orders", "orders_building_revenue",
            "lineitem_unpivot"]


def _random_tpch(rng: np.random.Generator, tmp: "Path") -> None:
    """FK-consistent random TPC-H tables with the adversarial edges the
    smooth fixture avoids: duplicated totalprices (rank ties), exact
    .xx5 prices (half-away rounding), zero discounts, dates pinned to
    the oracles' predicate boundaries, hot customers, customers with no
    orders and orders with no lineitems (join/anti-join edges)."""
    import shutil
    for t in ("nation", "region"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    tmp / f"{t}.parquet")
    n_cust, n_ord, n_li, n_supp, n_part = 60, 300, 900, 8, 40
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
            "FURNITURE"]
    cust = pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust)),
        "c_acctbal": pa.array(np.round(rng.normal(0, 500, n_cust), 2)),
        "c_mktsegment": pa.array([str(s) for s in
                                  rng.choice(segs, n_cust)])})
    pq.write_table(cust, tmp / "customer.parquet")
    # hot customer 7; last 10 customers get no orders at all
    ck = np.where(rng.random(n_ord) < 0.3, 7,
                  rng.integers(0, n_cust - 10, n_ord)).astype(np.int64)
    price = np.round(rng.uniform(100, 400000, n_ord), 2)
    price[::5] = price[5::5 * 2].repeat(2)[:len(price[::5])] \
        if False else price[::5]
    price[::7] = np.floor(price[::7]) + 0.005         # exact half cents
    price[1::9] = price[0]                            # heavy rank ties
    day = np.int64(86_400_000_000)
    epoch96 = np.int64(820_454_400_000_000)           # 1996-01-01 UTC
    dates = epoch96 + rng.integers(-400, 1100, n_ord) * day
    dates[::11] = epoch96                             # boundary exact
    dates[::13] = np.int64(896_659_200_000_000)       # 1998-06-01 exact
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(ck),
        "o_orderstatus": pa.array([str(s) for s in
                                   rng.choice(["O", "F", "P"], n_ord)]),
        "o_totalprice": pa.array(price),
        "o_orderdate": pa.array(dates).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array([str(s) for s in rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM"], n_ord)])})
    pq.write_table(orders, tmp / "orders.parquet")
    supp = pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"s{i}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp)),
        "s_acctbal": pa.array(np.round(rng.normal(0, 100, n_supp), 2))})
    pq.write_table(supp, tmp / "supplier.parquet")
    part = pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([f"p{i}" for i in range(n_part)]),
        "p_brand": pa.array([f"B{i % 5}" for i in range(n_part)]),
        "p_type": pa.array([f"T{i % 7}" for i in range(n_part)]),
        "p_size": pa.array(rng.integers(1, 50, n_part)),
        "p_retailprice": pa.array(
            np.round(rng.uniform(1, 2000, n_part), 2))})
    pq.write_table(part, tmp / "part.parquet")
    # lineitems only for the first 280 orders (20 orders lineitem-less)
    lo = rng.integers(0, 280, n_li).astype(np.int64)
    ep = np.round(rng.uniform(1, 90000, n_li), 2)
    ep[::7] = np.floor(ep[::7]) + 0.005
    disc = np.round(rng.choice([0.0, 0.01, 0.05, 0.055, 0.1], n_li), 3)
    ldates = epoch96 + rng.integers(-200, 1200, n_li) * day
    ldates[::13] = np.int64(896_659_200_000_000) + day  # just past cutoff
    li = pa.table({
        "l_orderkey": pa.array(lo),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(rng.integers(1, 7, n_li)
                                 .astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 50, n_li)
                               .astype(np.float64)),
        "l_extendedprice": pa.array(ep),
        "l_discount": pa.array(disc),
        "l_tax": pa.array(np.round(rng.choice([0.0, 0.02, 0.08], n_li),
                                   2)),
        "l_returnflag": pa.array([str(s) for s in
                                  rng.choice(["A", "N", "R"], n_li)]),
        "l_linestatus": pa.array([str(s) for s in
                                  rng.choice(["O", "F"], n_li)]),
        "l_shipdate": pa.array(ldates).cast(pa.timestamp("us"))})
    pq.write_table(li, tmp / "lineitem.parquet")


@pytest.mark.parametrize("seed", [0, 1])
def test_tpch_ops_match_oracle_on_tied_boundary_input(
        ray_session, tmp_path, seed):
    import __ray_entry__ as E
    rng = np.random.default_rng(seed)
    d = tmp_path / f"tpch{seed}"
    d.mkdir()
    _random_tpch(rng, d)
    con = duckdb.connect()
    for t in ("nation", "region", "customer", "orders", "supplier",
              "part", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    oracles = E.oracle_sql()
    qs = E.queries()
    for name in TPCH_OPS:
        got = qs[name](str(d))
        if not isinstance(got, (pa.Table, pd.DataFrame)):
            got = got.to_pandas()
        elif isinstance(got, pa.Table):
            got = got.to_pandas()
        want = con.execute(oracles[name]).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False,
                                      obj=f"{name} (seed {seed})")
