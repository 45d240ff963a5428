from tasmania_tpu.parallel.halo import halo_exchange
from tasmania_tpu.parallel.mesh import CartesianDecomposition, make_mesh

__all__ = ["halo_exchange", "CartesianDecomposition", "make_mesh"]
