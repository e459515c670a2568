from foley_tpu.models import mmdit

__all__ = ["mmdit"]
