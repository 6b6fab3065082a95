from .mesh import input_shardings, make_mesh, output_shardings

__all__ = ["make_mesh", "input_shardings", "output_shardings"]
