def sync_shared_params(model, process_group):
    """Single-process stand-in: nothing to sync."""


def all_gather_raw(tensor, process_group):
    return tensor, None
