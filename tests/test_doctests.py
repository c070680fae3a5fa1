"""Executable documentation examples (the reference's doc-test
strategy: nearly every public fn in fidget-core carries a runnable
example, e.g. fidget-core/src/context/mod.rs:227-233). Each listed
module must contain at least one example and every example must run."""

import doctest

import pytest

import fidget_tpu.compiler.bytecode
import fidget_tpu.compiler.lower
import fidget_tpu.core.context
import fidget_tpu.core.tree
import fidget_tpu.core.var
import fidget_tpu.gui
import fidget_tpu.mesh
import fidget_tpu.render.region
import fidget_tpu.script
import fidget_tpu.shape
import fidget_tpu.shapes
import fidget_tpu.solver

MODULES = [
    fidget_tpu.core.context,
    fidget_tpu.core.tree,
    fidget_tpu.core.var,
    fidget_tpu.compiler.lower,
    fidget_tpu.compiler.bytecode,
    fidget_tpu.shape,
    fidget_tpu.shapes,
    fidget_tpu.script,
    fidget_tpu.solver,
    fidget_tpu.mesh,
    fidget_tpu.render.region,
    fidget_tpu.gui,
]


@pytest.mark.parametrize("mod", MODULES, ids=lambda m: m.__name__)
def test_doctests(mod):
    res = doctest.testmod(
        mod, optionflags=doctest.NORMALIZE_WHITESPACE, verbose=False
    )
    assert res.failed == 0
    assert res.attempted > 0, f"{mod.__name__} lost its doc examples"
