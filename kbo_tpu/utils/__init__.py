from kbo_tpu.utils.stats import get_stats, profile_trace, reset_stats, stage
