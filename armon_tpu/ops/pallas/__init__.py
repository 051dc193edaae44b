from .sweep import fused_sweep, pallas_supported
