from .argmax import first_per_key, last_per_key
from .budget import select_under_budget
from .collocations import pmi_bigrams
from .divergence import source_kl
from .quantiles import (binned_quantiles, grouped_quantiles,
                        percent_rank_column)
from .rank import global_row_number
from .reshape import melt, zscore_column
from .rollup import rollup_counts
from .salted import salted_sum
from .sketches import (bloom_from_text, distinct_count_hll, heavy_hitters)
from .textstats import TOKEN_PATTERN, fingerprint_batch, token_count_batch

__all__ = [
    "TOKEN_PATTERN", "binned_quantiles", "bloom_from_text",
    "distinct_count_hll", "fingerprint_batch", "first_per_key",
    "global_row_number", "grouped_quantiles", "heavy_hitters",
    "last_per_key", "melt",
    "percent_rank_column", "pmi_bigrams", "rollup_counts", "salted_sum",
    "select_under_budget", "source_kl", "token_count_batch",
    "zscore_column",
]
