from .rate_control import solve_rate_for_bpp
from .service import CodecService, ServiceStats

__all__ = ["CodecService", "ServiceStats", "solve_rate_for_bpp"]
