"""Multi-chip scaling over jax.sharding meshes."""
from tpukit.parallel.mesh import make_mesh, sharded_analysis_step, run_sharded_batch
