from .mesh import make_mesh, shard_state_spec
from .halo import halo_exchange
