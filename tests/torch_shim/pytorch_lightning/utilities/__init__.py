def rank_zero_only(fn):
    """Single-process stand-in: always rank zero."""
    return fn


rank_zero_only.rank = 0
