"""Tag numbering scheme for meshing geometry objects (reference
``fracs/gmsh_interface.py:46``). The gmsh writer itself requires the gmsh
package and is not part of this build; the tags are used throughout the
fracture-network decomposition."""

from __future__ import annotations

from enum import Enum

__all__ = ["Tags", "PhysicalNames", "GmshInterfaceTags"]


class Tags(Enum):
    NEUTRAL = 0
    DOMAIN_BOUNDARY_POINT = 1
    DOMAIN_BOUNDARY_LINE = 2
    DOMAIN_BOUNDARY_SURFACE = 3
    FRACTURE = 10
    AUXILIARY_LINE = 11
    AUXILIARY_PLANE = 12
    FRACTURE_TIP = 20
    FRACTURE_INTERSECTION_LINE = 21
    FRACTURE_BOUNDARY_LINE = 22
    FRACTURE_INTERSECTION_POINT = 30
    FRACTURE_CONSTRAINT_INTERSECTION_POINT = 31
    FRACTURE_BOUNDARY_POINT = 32


# The reference exposes the same enum under this name in parts of the code.
GmshInterfaceTags = Tags


class PhysicalNames(Enum):
    DOMAIN = "DOMAIN"
    DOMAIN_BOUNDARY_POINT = "DOMAIN_BOUNDARY_POINT_"
    DOMAIN_BOUNDARY_SURFACE = "DOMAIN_BOUNDARY_SURFACE_"
    DOMAIN_BOUNDARY_LINE = "DOMAIN_BOUNDARY_LINE_"
    FRACTURE = "FRACTURE_"
    AUXILIARY_LINE = "AUXILIARY_LINE_"
    AUXILIARY_PLANE = "AUXILIARY_PLANE_"
    FRACTURE_TIP = "FRACTURE_TIP_"
    FRACTURE_INTERSECTION_LINE = "FRACTURE_INTERSECTION_LINE_"
    FRACTURE_BOUNDARY_LINE = "FRACTURE_BOUNDARY_LINE_"
    FRACTURE_INTERSECTION_POINT = "FRACTURE_INTERSECTION_POINT_"
    FRACTURE_CONSTRAINT_INTERSECTION_POINT = (
        "FRACTURE_CONSTRAINT_INTERSECTION_POINT_"
    )
    FRACTURE_BOUNDARY_POINT = "FRACTURE_BOUNDARY_POINT_"
