from .fused_stats import se_iso_stream_stats_fused

__all__ = ["se_iso_stream_stats_fused"]
