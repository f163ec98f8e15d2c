"""The lineitem analytics queries (pricing summary, supplier revenue)
against a DuckDB oracle at sf0.001 — exercises predicate-pushdown reads,
per-batch partial aggregation, multi-key groupby, and the composed
broadcast map-side join."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ("lineitem", "supplier", "nation", "region", "documents",
              "orders", "customer", "events", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", ["lineitem_pricing", "supplier_revenue",
                                  "doc_length_quantiles",
                                  "top_orders_per_segment",
                                  "doc_repetition", "events_sliding",
                                  "customers_no_big_orders", "events_lag",
                                  "para_dedup", "dedup_incremental",
                                  "doc_length_topp",
                                  "distinct_words_exact",
                                  "local_supplier_volume",
                                  "top_unshipped_orders", "events_pivot",
                                  "events_cumsum", "docs_per_source_cap",
                                  "lang_temperature_mix", "line_dedup",
                                  "events_funnel",
                                  "embedding_centroid_by_label",
                                  "events_top_spenders",
                                  "doc_dup_ngrams",
                                  "lineitem_revenue_filter",
                                  "weighted_sample", "embedding_inference",
                                  "gopher_filter", "substring_dedup",
                                  "substring_dedup_winnowed",
                                  "dedup_indexed", "bm25_topk",
                                  "dsir_select", "ccnet_buckets",
                                  "nb_lang_classify",
                                  "weighted_sample_by_lang",
                                  "nb_confusion", "corpus_datacard",
                                  "events_funnel_count",
                                  "bm25_indexed"])
def test_query_matches_duckdb(ray_session, oracle_con, name):
    import __ray_entry__ as E

    got = _canon(E.queries()[name](SF).to_pandas())
    want = _canon(oracle_con.execute(E.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
