from foley_tpu.utils.config_utils import AttributeDict, load_yaml

__all__ = ["AttributeDict", "load_yaml"]
