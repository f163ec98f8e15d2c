from .textstats import token_count_batch, fingerprint_batch, TOKEN_PATTERN

__all__ = ["token_count_batch", "fingerprint_batch", "TOKEN_PATTERN"]
