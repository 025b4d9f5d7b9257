"""Abstract equation and variable mixins.

Parity counterpart of reference ``models/abstract_equations.py``: the
balance-equation template ``d_t(accumulation) + div(surface_term) - source``
and the volume-integral helper including specific volumes; the variable
mixin hook.
"""

from __future__ import annotations

from typing import Sequence, Union

from porepy_tpu.numerics import ad

__all__ = ["EquationMixin", "BalanceEquation", "VariableMixin"]


class EquationMixin:
    """Base for equation mixins; cooperative ``set_equations``."""

    def set_equations(self) -> None:
        pass


class BalanceEquation(EquationMixin):
    def balance_equation(
        self,
        subdomains: Sequence,
        accumulation: ad.Operator,
        surface_term: ad.Operator,
        source: ad.Operator,
        dim: int,
    ) -> ad.Operator:
        """``d_t(accumulation) + div(surface_term) - source``."""
        div = ad.Divergence(subdomains, dim=dim)
        return ad.dt(accumulation, self.ad_time_step) + div @ surface_term - source

    def volume_integral(
        self, integrand: ad.Operator, grids: Sequence, dim: int
    ) -> ad.Operator:
        """Cell-volume (and specific-volume) weighted integrand."""
        cell_volumes = self.wrap_grid_attribute(grids, "cell_volumes", dim=1)
        if dim == 1:
            return cell_volumes * self.specific_volume(grids) * integrand
        basis = self.basis(grids, dim=dim)
        volumes_nd = ad.sum_operator_list(
            [e @ (cell_volumes * self.specific_volume(grids)) for e in basis]
        )
        return volumes_nd * integrand


class VariableMixin:
    """Base for variable mixins; cooperative ``create_variables``."""

    def create_variables(self) -> None:
        pass

    def perturbation_from_reference(
        self, name: str, grids: Sequence
    ) -> ad.Operator:
        """``quantity - reference_value`` (reference
        ``abstract_equations.py:523``)."""
        quantity = getattr(self, name)(grids)
        ref = getattr(self.reference_variable_values, name)
        out = quantity - ad.Scalar(float(ref))
        out.set_name(f"{name}_perturbation")
        return out
