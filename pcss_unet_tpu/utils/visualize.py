"""Computation-graph visualization (reference visualize.py role).

The reference renders torch autograd graphs with graphviz
(visualize.py:21-68).  The JAX equivalents of "show me the graph":

- ``jaxpr_text(fn, *args)``      — the traced jaxpr
- ``hlo_text(fn, *args)``        — StableHLO after lowering
- ``optimized_hlo_text(fn, *args)`` — what XLA actually runs (post-fusion),
  the ground truth for checking operator fusion on TPU
- ``jaxpr_dot(fn, *args)``       — graphviz DOT of the jaxpr's eqn graph
  (renders with the ``graphviz`` python package when available, else
  returns the DOT source string)
"""

from __future__ import annotations

import jax


def jaxpr_text(fn, *args, **kwargs) -> str:
    return str(jax.make_jaxpr(fn)(*args, **kwargs))


def hlo_text(fn, *args, **kwargs) -> str:
    return jax.jit(fn).lower(*args, **kwargs).as_text()


def optimized_hlo_text(fn, *args, **kwargs) -> str:
    return jax.jit(fn).lower(*args, **kwargs).compile().as_text()


def jaxpr_dot(fn, *args, max_nodes: int = 400, **kwargs) -> str:
    """DOT source for the jaxpr equation graph: primitives as nodes, value
    flow as edges (the autograd-graph analogue of visualize.py:21-68)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    jaxpr = closed.jaxpr
    lines = ["digraph jaxpr {", "  rankdir=TB;",
             '  node [shape=box, fontsize=10, style=filled,'
             ' fillcolor="#e8f0fe"];']
    names: dict[int, str] = {}

    def vname(v):
        key = id(v)
        if key not in names:
            names[key] = f"v{len(names)}"
        return names[key]

    for i, var in enumerate(jaxpr.invars):
        node = vname(var)
        lines.append(f'  {node} [label="input {i}\\n{var.aval.str_short()}",'
                     ' fillcolor="#d2e3fc"];')
    for n, eqn in enumerate(jaxpr.eqns[:max_nodes]):
        enode = f"e{n}"
        lines.append(f'  {enode} [label="{eqn.primitive.name}"];')
        for var in eqn.invars:
            if hasattr(var, "aval"):
                lines.append(f"  {vname(var)} -> {enode};")
        for var in eqn.outvars:
            node = vname(var)
            lines.append(f'  {node} [label="{var.aval.str_short()}",'
                         ' fillcolor="#ffffff"];')
            lines.append(f"  {enode} -> {node};")
    if len(jaxpr.eqns) > max_nodes:
        lines.append(f'  truncated [label="... {len(jaxpr.eqns) - max_nodes}'
                     ' more eqns", fillcolor="#fce8e6"];')
    for i, var in enumerate(jaxpr.outvars):
        if hasattr(var, "aval"):
            lines.append(f'  out{i} [label="output {i}",'
                         ' fillcolor="#ceead6"];')
            lines.append(f"  {vname(var)} -> out{i};")
    lines.append("}")
    return "\n".join(lines)


def render_dot(dot_source: str, out_path: str) -> str | None:
    """Render DOT to an image if the graphviz package is present; returns
    the written path or None (the DOT source is still usable as text)."""
    try:
        import graphviz  # noqa: PLC0415

        src = graphviz.Source(dot_source)
        return src.render(outfile=out_path, cleanup=True)
    except Exception:  # noqa: BLE001 - graphviz genuinely optional
        return None
