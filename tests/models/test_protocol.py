"""PorePyModel protocol: importable, mixin-safe at runtime (no
``__slots__`` interference — reference ``models/protocol.py:10-16``)."""

import numpy as np

import porepy_tpu as pt


def test_protocol_runtime_mixin_safe():
    class Mixin(pt.PorePyModel):
        def extra_term(self):
            return self.nd

    class Model(Mixin, pt.SinglePhaseFlow):
        pass

    m = Model({})
    m.prepare_simulation()
    assert m.extra_term() == m.nd
    assert isinstance(
        m.equation_system.get_variable_values(iterate_index=0), np.ndarray
    )
