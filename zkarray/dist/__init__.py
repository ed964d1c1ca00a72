from zkarray.dist.mesh import make_mesh
from zkarray.dist.msm import msm_sharded
from zkarray.dist.ntt import fft_fourstep, fft_sharded

__all__ = ["make_mesh", "msm_sharded", "fft_fourstep", "fft_sharded"]
