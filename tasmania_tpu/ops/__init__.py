from tasmania_tpu.ops.advection_step import fused_advection_step

__all__ = ["fused_advection_step"]
