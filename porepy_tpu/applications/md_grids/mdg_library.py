"""Canned mixed-dimensional grids (reference
``applications/md_grids/mdg_library.py``). Simplex variants require gmsh;
cartesian/tensor variants are gmsh-free."""

from __future__ import annotations

from typing import Optional

import numpy as np

from porepy_tpu.applications.md_grids import domains, fracture_sets
from porepy_tpu.fracs.fracture_network import create_fracture_network
from porepy_tpu.grids.mdg_generation import create_mdg

__all__ = [
    "square_with_orthogonal_fractures",
    "cube_with_orthogonal_fractures",
    "seven_fractures_one_L_intersection",
    "benchmark_regular_2d",
]


def square_with_orthogonal_fractures(
    grid_type: str,
    meshing_args: dict,
    fracture_indices: list[int],
    fracture_endpoints: Optional[list] = None,
    size=1,
    **meshing_kwargs,
):
    """Unit(ish) square with one or two axis-aligned fractures through the
    middle. Returns (mdg, fracture network)."""
    if fracture_endpoints is None:
        fracture_endpoints = []
    if len(fracture_endpoints) != 2:
        all_endpoints = [np.array([0, size]), np.array([0, size])]
        for ind, endpoint in zip(fracture_indices, fracture_endpoints):
            all_endpoints[ind] = endpoint
        fracture_endpoints = all_endpoints
    all_fractures = fracture_sets.orthogonal_fractures_2d(
        size, fracture_endpoints
    )
    fractures = [all_fractures[i] for i in fracture_indices]
    domain = domains.nd_cube_domain(2, size)
    network = create_fracture_network(fractures, domain)
    mdg = create_mdg(grid_type, meshing_args, network, **meshing_kwargs)
    mdg.compute_geometry()
    return mdg, network


def cube_with_orthogonal_fractures(
    grid_type: str,
    meshing_args: dict,
    fracture_indices: list[int],
    size=1,
    **meshing_kwargs,
):
    """Cube with up to three axis-aligned plane fractures through the
    middle. Returns (mdg, fracture network)."""
    all_fractures = fracture_sets.orthogonal_fractures_3d(size)
    fractures = [all_fractures[i] for i in fracture_indices]
    domain = domains.nd_cube_domain(3, size)
    network = create_fracture_network(fractures, domain)
    mdg = create_mdg(grid_type, meshing_args, network, **meshing_kwargs)
    mdg.compute_geometry()
    return mdg, network


def seven_fractures_one_L_intersection(meshing_args: dict, **meshing_kwargs):
    """Berge et al. 2019 example geometry (simplex meshing; needs gmsh)."""
    from porepy_tpu.geometry.domain import Domain

    fractures = fracture_sets.seven_fractures_one_L_intersection()
    domain = Domain({"xmin": 0, "xmax": 2, "ymin": 0, "ymax": 1})
    network = create_fracture_network(fractures, domain)
    mdg = create_mdg("simplex", meshing_args, network, **meshing_kwargs)
    mdg.compute_geometry()
    return mdg, network


def benchmark_regular_2d(meshing_args: dict, is_coarse: bool = False, **kwargs):
    """Flemisch et al. 2018 case-1 geometry (simplex meshing; needs gmsh)."""
    fractures = fracture_sets.benchmark_2d_case_1()
    domain = domains.unit_cube_domain(2)
    network = create_fracture_network(fractures, domain)
    mdg = create_mdg("simplex", meshing_args, network, **kwargs)
    mdg.compute_geometry()
    return mdg, network
