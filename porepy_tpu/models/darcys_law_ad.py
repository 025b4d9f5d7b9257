"""Differentiable-permeability constitutive fluxes (``DarcysLawAd`` /
``FouriersLawAd``).

Counterpart of the reference's ``AdTpfaFlux``/``DarcysLawAd``
(``models/constitutive_laws.py:1151,1803``): when the permeability (or
thermal conductivity) depends on the solution — cubic-law apertures driven
by displacement jumps, pressure-dependent permeability, total-mobility
tensors — the flux Jacobian must include the tensor's derivatives.

TPU-first realization: the reference re-discretizes a dedicated
``DifferentiableTpfa`` and splices matrix products into its AdArray
machinery. Here the TPFA transmissibility computation is *already* a pure
jax function of the permeability (``numerics/fv/tpfa.py``), so the flux
becomes one ``evaluate`` node whose children are the permeability operator,
the specific volume, the pressure, and the boundary/mortar operands — the
harmonic averaging compiles into the jitted residual and ``jax.linearize``
differentiates through it exactly. No rediscretization, no lagging.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import scipy.sparse as sps

from porepy_tpu.numerics import ad

__all__ = ["AdTpfaFlux", "DarcysLawAd", "FouriersLawAd"]


class _DiffTpfaGeometry:
    """Static per-subdomain-list arrays for the in-kernel TPFA."""

    def __init__(self, subdomains, bc_of) -> None:
        import jax.numpy as jnp

        from porepy_tpu.numerics.fv.fv_mesh import BoundaryMasks, FvMesh

        self.meshes = []
        self.masks = []
        self.cell_offsets = [0]
        self.face_offsets = [0]
        for sd in subdomains:
            self.meshes.append(FvMesh.from_grid(sd))
            self.masks.append(BoundaryMasks.from_bc(bc_of(sd)))
            self.cell_offsets.append(self.cell_offsets[-1] + sd.num_cells)
            self.face_offsets.append(self.face_offsets[-1] + sd.num_faces)
        self.num_cells = self.cell_offsets[-1]
        self.num_faces = self.face_offsets[-1]
        # Structural face-from-cell adjacency for the sparsity pattern.
        rows, cols = [], []
        for mesh, co, fo in zip(
            self.meshes, self.cell_offsets[:-1], self.face_offsets[:-1]
        ):
            rows.append(np.asarray(mesh.fi) + fo)
            cols.append(np.asarray(mesh.ci) + co)
        if rows:
            r = np.concatenate(rows)
            c = np.concatenate(cols)
        else:
            r = c = np.zeros(0, dtype=int)
        adj = sps.coo_matrix(
            (np.ones(r.size, dtype=bool), (r, c)),
            shape=(self.num_faces, self.num_cells),
        ).tocsr()
        # Two-cell stencil: faces see both adjacent cells' permeability and
        # pressure columns.
        self.face_cell_pattern = adj

    def flux_fn(self):
        """jax function ``(k9, vol, p, bco, lam_faces) -> face fluxes``.

        ``k9``: 9-per-cell tensor entries (cell-major); ``vol``: specific
        volumes scaling the tensor (aperture weighting); ``bco``: combined
        boundary operand (Dirichlet: boundary pressure; Neumann: prescribed
        flux); ``lam_faces``: mortar fluxes projected to faces.
        """
        import jax.numpy as jnp

        from porepy_tpu.numerics.fv.tpfa import (
            apply_flux,
            boundary_flux_coefficients,
            effective_transmissibilities,
        )

        geos = list(zip(self.meshes, self.masks))
        co, fo = self.cell_offsets, self.face_offsets

        def fn(k9, vol, p, bco, lam):
            out = []
            for i, (mesh, bnd) in enumerate(geos):
                nc = co[i + 1] - co[i]
                kv = k9[9 * co[i] : 9 * co[i + 1]].reshape(nc, 3, 3)
                kv = (kv * vol[co[i] : co[i + 1], None, None]).transpose(
                    1, 2, 0
                )
                t, _ = effective_transmissibilities(mesh, kv, bnd)
                coeff = boundary_flux_coefficients(mesh, t, bnd)
                b = bco[fo[i] : fo[i + 1]] + lam[fo[i] : fo[i + 1]]
                out.append(
                    apply_flux(mesh, t, p[co[i] : co[i + 1]], coeff, b)
                )
            return jnp.concatenate(out) if out else jnp.zeros(0)

        return fn

    def trace_fn(self):
        """jax function reconstructing the pressure trace on boundary faces:
        Dirichlet faces take the boundary value; Neumann faces take
        ``p_cell - flux / t_full``."""
        import jax
        import jax.numpy as jnp

        from porepy_tpu.numerics.fv.tpfa import face_transmissibilities

        geos = list(zip(self.meshes, self.masks))
        co, fo = self.cell_offsets, self.face_offsets

        def fn(k9, vol, p, bco, lam):
            out = []
            for i, (mesh, bnd) in enumerate(geos):
                nc = co[i + 1] - co[i]
                kv = k9[9 * co[i] : 9 * co[i + 1]].reshape(nc, 3, 3)
                kv = (kv * vol[co[i] : co[i + 1], None, None]).transpose(
                    1, 2, 0
                )
                t_full = face_transmissibilities(mesh, kv)
                p_loc = p[co[i] : co[i + 1]]
                b = bco[fo[i] : fo[i + 1]] + lam[fo[i] : fo[i + 1]]
                # Owner-cell pressure on each (boundary) face.
                p_face = jnp.zeros(mesh.num_faces).at[mesh.fi].set(
                    p_loc[mesh.ci]
                )
                neu = bnd.is_neu_raw
                dirr = bnd.is_dir_raw
                trace = jnp.where(
                    dirr,
                    b,
                    jnp.where(
                        neu, p_face - b / jnp.where(neu, t_full, 1.0), 0.0
                    ),
                )
                out.append(trace)
            return jnp.concatenate(out) if out else jnp.zeros(0)

        return fn


class AdTpfaFlux:
    """Differentiable two-point flux machinery shared by Darcy and Fourier
    variants; mix in *above* the stored-matrix law so the overrides win."""

    def _diff_tpfa_geometry(self, subdomains, bc_of, cache_key: str):
        cache = getattr(self, "_adtpfa_cache", None)
        if cache is None:
            cache = self._adtpfa_cache = {}
        key = (cache_key, tuple(sd.id for sd in subdomains))
        if key not in cache:
            cache[key] = _DiffTpfaGeometry(subdomains, bc_of)
        return cache[key]

    def _diff_flux(
        self,
        subdomains: Sequence,
        geometry: _DiffTpfaGeometry,
        tensor_op: ad.Operator,
        potential_op: ad.Operator,
        boundary_op: ad.Operator,
        interface_flux,
        name: str,
    ) -> ad.Operator:
        lam = self._mortar_face_operand(subdomains, interface_flux)
        pat = geometry.face_cell_pattern

        def pattern_fn(child_patterns, ndof):
            import scipy.sparse as spsp

            from porepy_tpu.numerics.ad.compiler import _union

            k_pat, vol_pat, p_pat, bco_pat, lam_pat = child_patterns
            # Collapse the 9-per-cell tensor pattern to cells.
            ncell = geometry.num_cells
            collapse = spsp.csr_matrix(
                (
                    np.ones(9 * ncell, dtype=bool),
                    (np.repeat(np.arange(ncell), 9), np.arange(9 * ncell)),
                ),
                shape=(ncell, 9 * ncell),
            )
            cell_pat = (collapse @ k_pat).astype(bool)
            cell_pat = _union(cell_pat, vol_pat)
            cell_pat = _union(cell_pat, p_pat)
            out = (pat @ cell_pat).astype(bool).tocsr()
            return _union(_union(out, bco_pat), lam_pat)

        fn = ad.Function(geometry.flux_fn(), name=name, pattern_fn=pattern_fn)
        flux = fn(
            tensor_op,
            self.specific_volume(list(subdomains)),
            potential_op,
            boundary_op,
            lam,
        )
        flux.set_name(name)
        return flux

    def _diff_trace(
        self,
        subdomains: Sequence,
        geometry: _DiffTpfaGeometry,
        tensor_op: ad.Operator,
        potential_op: ad.Operator,
        boundary_op: ad.Operator,
        interface_flux,
        name: str,
    ) -> ad.Operator:
        lam = self._mortar_face_operand(subdomains, interface_flux)
        pat = geometry.face_cell_pattern

        def pattern_fn(child_patterns, ndof):
            import scipy.sparse as spsp

            from porepy_tpu.numerics.ad.compiler import _union

            k_pat, vol_pat, p_pat, bco_pat, lam_pat = child_patterns
            ncell = geometry.num_cells
            collapse = spsp.csr_matrix(
                (
                    np.ones(9 * ncell, dtype=bool),
                    (np.repeat(np.arange(ncell), 9), np.arange(9 * ncell)),
                ),
                shape=(ncell, 9 * ncell),
            )
            cell_pat = (collapse @ k_pat).astype(bool)
            cell_pat = _union(cell_pat, vol_pat)
            cell_pat = _union(cell_pat, p_pat)
            out = (pat @ cell_pat).astype(bool).tocsr()
            return _union(_union(out, bco_pat), lam_pat)

        fn = ad.Function(geometry.trace_fn(), name=name, pattern_fn=pattern_fn)
        trace = fn(
            tensor_op,
            self.specific_volume(list(subdomains)),
            potential_op,
            boundary_op,
            lam,
        )
        trace.set_name(name)
        return trace

    def _mortar_face_operand(self, subdomains, interface_flux) -> ad.Operator:
        """Mortar fluxes projected onto primary faces (zero without
        interfaces)."""
        interfaces = self.subdomains_to_interfaces(list(subdomains), [1])
        if interfaces and interface_flux is not None:
            projection = ad.MortarProjections(
                self.mdg, list(subdomains), interfaces, dim=1
            )
            return projection.mortar_to_primary_int() @ interface_flux(
                interfaces
            )
        num_faces = int(sum(sd.num_faces for sd in subdomains))
        return ad.DenseArray(np.zeros(num_faces), name="zero_mortar_fluxes")


class DarcysLawAd(AdTpfaFlux):
    """Darcy flux with the permeability operator differentiated in-kernel
    (reference ``constitutive_laws.py:1803`` DarcysLawAd)."""

    def darcy_flux(self, domains: Sequence) -> ad.Operator:
        from porepy_tpu.grids.boundary_grid import BoundaryGrid

        if len(domains) == 0 or all(isinstance(d, BoundaryGrid) for d in domains):
            return super().darcy_flux(domains)
        subdomains = [sd for sd in domains if sd.dim > 0]
        zero_d = [sd for sd in domains if sd.dim == 0]
        if zero_d:
            raise NotImplementedError(
                "Differentiable TPFA expects positive-dimensional subdomains"
            )
        geometry = self._diff_tpfa_geometry(
            subdomains, self.bc_type_darcy_flux, "darcy"
        )
        return self._diff_flux(
            subdomains,
            geometry,
            self.permeability(subdomains),
            self.pressure(subdomains),
            self.combine_boundary_operators_darcy_flux(subdomains),
            self.interface_darcy_flux,
            "differentiable_darcy_flux",
        )

    def pressure_trace(self, subdomains: Sequence) -> ad.Operator:
        geometry = self._diff_tpfa_geometry(
            list(subdomains), self.bc_type_darcy_flux, "darcy"
        )
        return self._diff_trace(
            list(subdomains),
            geometry,
            self.permeability(list(subdomains)),
            self.pressure(list(subdomains)),
            self.combine_boundary_operators_darcy_flux(list(subdomains)),
            self.interface_darcy_flux,
            "differentiable_pressure_trace",
        )


class FouriersLawAd(AdTpfaFlux):
    """Fourier flux with a differentiable thermal conductivity tensor
    (reference ``constitutive_laws.py`` FouriersLawAd)."""

    def fourier_flux(self, domains: Sequence) -> ad.Operator:
        from porepy_tpu.grids.boundary_grid import BoundaryGrid

        if len(domains) == 0 or all(isinstance(d, BoundaryGrid) for d in domains):
            return super().fourier_flux(domains)
        subdomains = list(domains)
        geometry = self._diff_tpfa_geometry(
            subdomains, self.bc_type_fourier_flux, "fourier"
        )
        return self._diff_flux(
            subdomains,
            geometry,
            self.thermal_conductivity(subdomains),
            self.temperature(subdomains),
            self.combine_boundary_operators_fourier_flux(subdomains),
            self.interface_fourier_flux,
            "differentiable_fourier_flux",
        )
