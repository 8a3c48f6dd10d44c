"""Declared-I/O dataflow analysis over pipeline units.

Functional port of the reference ``PipelineUnitGraph``
(``diffusion/base_pipeline.py:316-408``): units declare the parameters they
read/write and the models they touch; :func:`split_units` separates the
subgraph that participates in the trained model's computation (runs inside
the jitted train step) from the pure preprocessing prefix (runs once in the
2-phase ``data_process`` stage and is cached — see
``training/data_process.py``).

Semantics preserved exactly:
  * an edge u→v exists when v reads a parameter LAST written by u;
  * the related set seeds from units touching ``model_names`` and closes
    downstream over edges;
  * any unit that REWRITES a parameter the related subgraph consumes after
    the subgraph first read it is pulled in too ("updating units");
  * iterate to a fixpoint.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class UnitSpec:
    """A pipeline step's declared dataflow interface."""
    name: str
    inputs: Tuple[str, ...] = ()
    outputs: Tuple[str, ...] = ()
    models: Tuple[str, ...] = ()  # onload_model_names equivalent

    def __post_init__(self):
        object.__setattr__(self, "inputs", tuple(self.inputs))
        object.__setattr__(self, "outputs", tuple(self.outputs))
        object.__setattr__(self, "models", tuple(self.models))


def build_edges(units: Sequence[UnitSpec]) -> List[Tuple[int, int]]:
    """(producer, consumer) edges via last-writer-wins (:321-331)."""
    last_writer: Dict[str, int] = {}
    edges = []
    for uid, unit in enumerate(units):
        for p in unit.inputs:
            if p in last_writer:
                edges.append((last_writer[p], uid))
        for p in unit.outputs:
            last_writer[p] = uid
    return edges


def build_chains(units: Sequence[UnitSpec]) -> Dict[str, List[int]]:
    """Per-parameter writer chains (:333-343)."""
    chains: Dict[str, List[int]] = {}
    for uid, unit in enumerate(units):
        for p in unit.inputs + unit.outputs:
            chains.setdefault(p, [])
    for uid, unit in enumerate(units):
        for p in unit.outputs:
            chains[p].append(uid)
    return chains


def _close_downstream(edges, seed):
    related = set(seed)
    changed = True
    while changed:
        changed = False
        for src, dst in edges:
            if src in related and dst not in related:
                related.add(dst)
                changed = True
    return related


def _updating_units(units, chains, related):
    """Writers that update a related unit's input AFTER its first read
    (:373-390): those rewrites must happen inside the subgraph too."""
    first_reader: Dict[str, int] = {}
    for uid in sorted(related):
        for p in units[uid].inputs:
            first_reader.setdefault(p, uid)
    extra = set()
    for p, uid in first_reader.items():
        chain = chains.get(p, [])
        if uid in chain and chain.index(uid) != len(chain) - 1:
            for later in chain[chain.index(uid) + 1:]:
                if later not in related:
                    extra.add(later)
    return extra


def split_units(units: Sequence[UnitSpec], model_names: Sequence[str]):
    """-> (model_related, preprocessing) unit lists (:392-408)."""
    related = {
        uid for uid, u in enumerate(units)
        if any(m in u.models for m in model_names)
    }
    edges = build_edges(units)
    chains = build_chains(units)
    while True:
        before = len(related)
        related = _close_downstream(edges, related)
        related |= _updating_units(units, chains, related)
        if len(related) == before:
            break
    related_units = [units[i] for i in sorted(related)]
    other = [units[i] for i in range(len(units)) if i not in related]
    return related_units, other
