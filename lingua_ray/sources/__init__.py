from .transcripts import ensure_transcripts, generate_transcripts

__all__ = ["ensure_transcripts", "generate_transcripts"]
