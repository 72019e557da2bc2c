"""Dataflow graph visualization.

Reference surface: ``visualize()``
(`/root/reference/deva/core/compute/graph.py:63-320`) — renders the
stream node graph via graphviz.

Spark mapping: the dataflow graph IS the Catalyst plan. This module walks
the optimized logical plan tree (or the executed physical plan) and emits
Graphviz DOT — no graphviz binary required to produce the artifact; any
renderer consumes the ``.dot``. Physical mode annotates the
scale-relevant nodes (exchanges, broadcasts, scans) so a plan review can
spot an accidental shuffle at a glance.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_CONNECTOR = re.compile(r"^((?:[ :+]|-)*?)([+:]- )?(\S.*)$")


def plan_nodes(df: DataFrame, physical: bool = False) -> list[tuple[int, str]]:
    """(depth, label) per plan node, parsed from the plan tree text
    (each tree level indents by 3 chars: ``+- `` / ``:- `` / ``:  ``)."""
    qe = df._jdf.queryExecution()
    text = str(qe.executedPlan() if physical else qe.optimizedPlan())
    out: list[tuple[int, str]] = []
    for line in text.splitlines():
        m = _CONNECTOR.match(line)
        if not m or not m.group(3):
            continue
        prefix, connector, label = m.groups()
        if connector is None and prefix:
            continue  # wrapped argument continuation, not a tree node
        depth = (len(prefix) + len(connector or "")) // 3
        out.append((depth, label.strip()))
    return out


def _name_of(label: str) -> str:
    # strip the whole-stage-codegen prefix first: joins print as
    # '*(2) SortMergeJoin ...' under codegen, and splitting on '('
    # yielded '*' — so the hot operators the docstring promises to
    # highlight were never matched on a default-config plan (r11 review)
    label = re.sub(r"^\*\(\d+\)\s*", "", label)
    return re.split(r"[ (\[]", label, maxsplit=1)[0]


#: physical operators that decide whether a plan scales
_HOT = {
    "Exchange": "#d62728",  # shuffle — the thing to count
    "BroadcastExchange": "#2ca02c",
    "BroadcastHashJoin": "#2ca02c",
    "SortMergeJoin": "#ff7f0e",
    "CartesianProduct": "#d62728",
}


def to_dot(df: DataFrame, physical: bool = False, max_label: int = 80) -> str:
    """Graphviz DOT of the plan tree. Node labels are truncated operator
    lines; scale-relevant physical operators are color-coded."""
    nodes = plan_nodes(df, physical=physical)
    lines = [
        "digraph plan {",
        "  rankdir=BT;",
        '  node [shape=box, fontname="monospace", fontsize=10];',
    ]
    stack: list[int] = []  # node-id stack by depth
    for i, (depth, label) in enumerate(nodes):
        name = _name_of(label)
        short = label if len(label) <= max_label else label[: max_label - 1] + "…"
        short = short.replace("\\", "\\\\").replace('"', '\\"')
        color = _HOT.get(name)
        style = f', style=filled, fillcolor="{color}", fontcolor=white' if color else ""
        lines.append(f'  n{i} [label="{short}"{style}];')
        del stack[depth:]
        if stack:
            lines.append(f"  n{i} -> n{stack[-1]};")  # child -> parent (data flows up)
        stack.append(i)
    lines.append("}")
    return "\n".join(lines)


def visualize(df: DataFrame, path: str | None = None, physical: bool = False) -> str:
    """``visualize()`` analog: return the DOT source (and write it to
    ``path`` when given — render with any graphviz tool)."""
    dot = to_dot(df, physical=physical)
    if path:
        with open(path, "w", encoding="utf-8") as f:
            f.write(dot)
    return dot


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan — the first number
    a 100-TB plan review asks for."""
    return sum(
        1
        for _d, label in plan_nodes(df, physical=True)
        if _name_of(label) == "Exchange"
    )
