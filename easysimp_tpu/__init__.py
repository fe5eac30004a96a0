"""easysimp_tpu — TPU-native SIMP topology optimization in JAX/XLA/Pallas.

A ground-up rebuild of the capabilities of EasySIMP.jl (reference:
/root/reference, surveyed in SURVEY.md) designed array-first for TPU:
matrix-free stencil stiffness operators on voxel grids, convolutional
filters, jit-compiled OC bisection, multigrid-preconditioned CG in place
of sparse direct Cholesky, and device-mesh sharding for scale.

The public API mirrors the reference's exports (src/EasySIMP.jl:45-75),
adapted to Python/JAX conventions (0-based indices, no mutating `!`).
"""

from .config import default_dtype, enable_x64, is_x64_enabled
from .grids import VoxelGrid, generate_grid
from .params import OptimizationParameters, OptimizationResult
from .bcs import (
    DirichletBC,
    apply_fixed_boundary,
    apply_sliding_boundary,
    build_free_mask,
    closest_node,
    select_nodes_by_arc,
    select_nodes_by_box,
    select_nodes_by_circle,
    select_nodes_by_cylinder,
    select_nodes_by_plane,
)
from .loads import (
    AbstractLoadCondition,
    PointLoad,
    SurfaceTractionLoad,
    apply_force,
    apply_surface_traction,
    build_load_field,
    get_boundary_facets,
)
from .ops.elements import (
    create_material_model,
    create_simp_material_model,
    hex8_stiffness,
    lame_parameters,
    simp_youngs_modulus,
    tet4_stiffness_batch,
)
from .ops.filters import FilterCacheTypes, create_filter_cache
from .ops.operator import UnstructuredOperator, VoxelOperator
from .opt.optimize import simp_optimize
from .stress import StressField, voxel_stresses
from .utils.terminal import (
    print_data,
    print_error,
    print_info,
    print_success,
    print_warning,
)
from .utils.volume import calculate_element_volumes, calculate_volume

__version__ = "0.1.0"

__all__ = [
    # config
    "enable_x64", "is_x64_enabled", "default_dtype",
    # grids / meshes
    "VoxelGrid", "generate_grid", "import_mesh", "setup_problem",
    # materials / elements
    "create_material_model", "create_simp_material_model",
    "simp_youngs_modulus", "lame_parameters", "hex8_stiffness",
    "tet4_stiffness_batch",
    # operators
    "VoxelOperator", "UnstructuredOperator",
    # BCs + node selection
    "DirichletBC", "apply_fixed_boundary", "apply_sliding_boundary",
    "build_free_mask", "select_nodes_by_plane", "select_nodes_by_circle",
    "select_nodes_by_cylinder", "select_nodes_by_arc", "select_nodes_by_box",
    "closest_node",
    # loads
    "AbstractLoadCondition", "PointLoad", "SurfaceTractionLoad",
    "apply_force", "apply_surface_traction", "build_load_field",
    "get_boundary_facets",
    # filters
    "create_filter_cache", "FilterCacheTypes",
    # optimization
    "OptimizationParameters", "OptimizationResult", "simp_optimize",
    # post-processing
    "StressField", "voxel_stresses", "export_results_vtu",
    "create_results_data", "export_boundary_conditions",
    # utils
    "calculate_volume", "calculate_element_volumes",
    "print_info", "print_error", "print_warning", "print_success",
    "print_data",
]


def import_mesh(path, **kwargs):
    """Import a .msh (Gmsh) or .vtu mesh as an UnstructuredMesh
    (parity: src/MeshImport/MeshImport.jl:20-164).  Lazy import keeps the
    voxel-only fast path free of IO dependencies."""
    from .mesh import import_mesh as _impl

    return _impl(path, **kwargs)


def setup_problem(grid, interpolation_order: int = 1):
    """API-parity shim for the reference `setup_problem`
    (FiniteElementAnalysis.jl:130-157).  The array-first design needs no
    DofHandler/CellValues/sparse K; returns the grid itself so reference-style
    scripts keep their shape."""
    if interpolation_order != 1:
        raise NotImplementedError("only first-order elements are supported")
    print_success(f"FEM setup complete: {grid.n_dofs} DOFs")
    return grid


def export_results_vtu(data, path, include_history: bool = True):
    from .post.vtu import export_results_vtu as _impl

    return _impl(data, path, include_history=include_history)


def create_results_data(grid, result):
    from .post.vtu import create_results_data as _impl

    return _impl(grid, result)


def export_boundary_conditions(grid, bcs, loads, path):
    from .post.bc_export import export_boundary_conditions as _impl

    return _impl(grid, bcs, loads, path)
