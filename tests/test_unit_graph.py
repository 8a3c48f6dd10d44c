"""Dataflow split parity vs the reference PipelineUnitGraph (differential:
both run on the same randomized topologies)."""
import os

import numpy as np
import pytest

from fairygen_tpu.core.unit_graph import UnitSpec, split_units

REF = "/root/reference/animation"


def _split_ours(specs, model_names):
    rel, other = split_units(specs, model_names)
    return [u.name for u in rel], [u.name for u in other]


def test_updating_unit_pulled_in():
    """A unit that rewrites a parameter consumed by the model subgraph after
    its first read must join the subgraph (base_pipeline.py:373-390)."""
    units = [
        UnitSpec("embed", inputs=("prompt",), outputs=("context",),
                 models=("text_encoder",)),
        UnitSpec("noise", inputs=("seed",), outputs=("latents",)),
        UnitSpec("denoise", inputs=("latents", "context"),
                 outputs=("latents",), models=("dit",)),
        UnitSpec("rewrite_ctx", inputs=("context",), outputs=("context",)),
    ]
    rel, other = _split_ours(units, ["dit"])
    assert "denoise" in rel
    # nothing downstream of denoise rewrites its inputs after first read here
    assert "noise" in other and "embed" in other


@pytest.mark.slow
def test_differential_vs_reference_graph():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    import sys

    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import _ref_import

        _ref_import.install_stubs()
        from diffsynth.diffusion.base_pipeline import (
            PipelineUnit, PipelineUnitGraph,
        )
    except Exception as e:
        pytest.skip(f"reference diffsynth not importable: {e}")

    rs = np.random.RandomState(0)
    params = [f"p{i}" for i in range(8)]
    models = ["dit", "vae", "text_encoder"]
    graph = PipelineUnitGraph()
    for trial in range(60):
        n = rs.randint(2, 9)
        specs, ref_units = [], []
        for i in range(n):
            ins = tuple(rs.choice(params, rs.randint(0, 3), replace=False))
            outs = tuple(rs.choice(params, rs.randint(1, 3), replace=False))
            mods = tuple(rs.choice(models, rs.randint(0, 2), replace=False))
            specs.append(UnitSpec(f"u{i}", ins, outs, mods))
            ref_units.append(PipelineUnit(
                input_params=ins, output_params=outs,
                onload_model_names=mods if mods else None,
            ))
        target = [models[rs.randint(0, 3)]]
        ours_rel, ours_other = _split_ours(specs, target)
        ref_rel, ref_other = graph.split_pipeline_units(ref_units, target)
        ref_rel_ids = [ref_units.index(u) for u in ref_rel]
        assert [f"u{i}" for i in ref_rel_ids] == ours_rel, (trial, target)
