from .distributed import (
    global_mesh,
    initialize,
    local_mesh,
    mesh_is_multiprocess,
    prove_batch_distributed,
)
from .mesh import input_shardings, make_mesh, output_shardings

__all__ = [
    "make_mesh",
    "input_shardings",
    "output_shardings",
    "initialize",
    "global_mesh",
    "local_mesh",
    "mesh_is_multiprocess",
    "prove_batch_distributed",
]
