from caduceus_tpu.utils.logging import make_logger, param_count

__all__ = ["make_logger", "param_count"]
