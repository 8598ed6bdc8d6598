from .service import CodecService, ServiceStats

__all__ = ["CodecService", "ServiceStats"]
