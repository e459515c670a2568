from foley_tpu.serving.server import FoleyService, create_server

__all__ = ["FoleyService", "create_server"]
