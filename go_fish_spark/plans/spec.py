"""Pipeline spec: parse + validate (≡ `pipeline.go:21-87`).

The reference's pipeline is a JSON document with top-level keys
``eventFolder, rules, states, sources, sinks`` (`pipeline.go:21-28`,
`README.md:87-129`); each rule names one source (a source *or* another
rule) and at most one sink (a sink *or* another rule) plus optionally one
state (`rule.go:24-29`).

Validation reproduces the reference's three checks (`pipeline.go:37-87`):
  1. referential integrity — every rule's source/sink/state must exist;
  2. duplicate-name rejection across sources/rules/sinks;
  3. one-rule-per-state (`pipeline.go:79-85`).
Plus a cycle check (the reference calls the graph a DAG but never verifies
acyclicity; rule→rule chains could loop silently).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


class ValidationError(ValueError):
    """Spec failed validation (≡ the error returns of `pipeline.go:37-87`)."""


@dataclass(frozen=True)
class SourceSpec:
    name: str
    type: str  # file | parquet | json | csv | kafka | kinesis | rate | certstream | memory
    options: dict = field(default_factory=dict)


@dataclass(frozen=True)
class SinkSpec:
    name: str
    type: str  # file | json | json_idempotent | parquet | parquet_upsert | sqs | memory | console
    options: dict = field(default_factory=dict)


@dataclass(frozen=True)
class RuleSpec:
    name: str
    source: str  # a source name OR another rule's name (`rule.go:24-29`)
    task: str  # registered task name (≡ plugin path, rule.go:26)
    sink: str | None = None  # a sink name OR another rule's name
    state: str | None = None
    options: dict = field(default_factory=dict)


@dataclass(frozen=True)
class StateSpec:
    name: str
    type: str  # KV | Count (`state/state.go:20-32`)


@dataclass(frozen=True)
class PipelineSpec:
    sources: dict[str, SourceSpec]
    rules: dict[str, RuleSpec]
    sinks: dict[str, SinkSpec]
    states: dict[str, StateSpec]

    def children_of(self, node: str) -> list[str]:
        """Rules fed by ``node`` (fan-out ≡ `pipeline.go:400-404`)."""
        return [r.name for r in self.rules.values() if r.source == node]


def parse_spec(raw: str | dict) -> PipelineSpec:
    """JSON → validated PipelineSpec (≡ `pipeline.go:30-87`). Malformed
    structure raises ValidationError (not TypeError/AttributeError), so
    the API's 400 path and the CLI's error path always engage."""
    try:
        cfg = json.loads(raw) if isinstance(raw, str) else raw
    except json.JSONDecodeError as e:
        raise ValidationError(f"config is not valid JSON: {e}") from e
    if not isinstance(cfg, dict):
        raise ValidationError(
            f"config must be a JSON object, got {type(cfg).__name__}"
        )

    def load(key, cls):
        section = cfg.get(key, {})
        if not isinstance(section, dict):
            raise ValidationError(f"{key!r} must be an object of name → body")
        out = {}
        for name, body in section.items():
            if not isinstance(body, dict):
                raise ValidationError(f"{key}.{name}: body must be an object")
            try:
                item = cls(name=name, **body)
            except TypeError as e:
                raise ValidationError(f"{key}.{name}: {e}") from e
            out[name] = item
        return out

    spec = PipelineSpec(
        sources=load("sources", SourceSpec),
        rules=load("rules", RuleSpec),
        sinks=load("sinks", SinkSpec),
        states=load("states", StateSpec),
    )
    validate(spec)
    return spec


def validate(spec: PipelineSpec) -> None:
    # 2. duplicate names across namespaces (`pipeline.go:56-66`): dataclass
    # dicts already dedupe within a kind; check across kinds.
    seen: dict[str, str] = {}
    for kind, names in (
        ("source", spec.sources),
        ("rule", spec.rules),
        ("sink", spec.sinks),
    ):
        for name in names:
            if name in seen:
                raise ValidationError(
                    f"duplicate name {name!r}: declared as both {seen[name]} and {kind}"
                )
            seen[name] = kind

    # 1. referential integrity (`pipeline.go:37-55`).
    for rule in spec.rules.values():
        if rule.source not in spec.sources and rule.source not in spec.rules:
            raise ValidationError(
                f"rule {rule.name!r}: unknown source {rule.source!r}"
            )
        if rule.source == rule.name:
            raise ValidationError(f"rule {rule.name!r}: cannot source itself")
        if rule.sink is not None and (
            rule.sink not in spec.sinks and rule.sink not in spec.rules
        ):
            raise ValidationError(f"rule {rule.name!r}: unknown sink {rule.sink!r}")
        if rule.state is not None and rule.state not in spec.states:
            raise ValidationError(
                f"rule {rule.name!r}: unknown state {rule.state!r}"
            )

    # 3a. state types are closed (`state/state.go:20-32`: factory errors
    # on anything but KV/Count).
    for st in spec.states.values():
        if st.type not in ("KV", "Count"):
            raise ValidationError(
                f"state {st.name!r}: unknown state type {st.type!r} "
                "(supported: KV, Count)"
            )

    # 3. one rule per state (`pipeline.go:79-85`).
    users: dict[str, str] = {}
    for rule in spec.rules.values():
        if rule.state is None:
            continue
        if rule.state in users:
            raise ValidationError(
                f"state {rule.state!r} used by both {users[rule.state]!r} "
                f"and {rule.name!r}; states are rule-local"
            )
        users[rule.state] = rule.name

    # 4. acyclicity (upgrade: the reference never checks). Directed
    # dataflow edges: rule.source=s (s a rule) is the edge s→rule;
    # rule.sink=t (t a rule) is the edge rule→t. (A.source=B and B.sink=A
    # describe the SAME edge B→A, not a cycle.)
    graph: dict[str, list[str]] = {r: [] for r in spec.rules}
    for r in spec.rules.values():
        if r.source in spec.rules:
            edge = (r.source, r.name)
            if edge[1] not in graph[edge[0]]:
                graph[edge[0]].append(edge[1])
        if r.sink in spec.rules:
            edge = (r.name, r.sink)
            if edge[1] not in graph[edge[0]]:
                graph[edge[0]].append(edge[1])
    WHITE, GRAY, BLACK = 0, 1, 2
    color = dict.fromkeys(graph, WHITE)

    def dfs(n: str, stack: list[str]) -> None:
        color[n] = GRAY
        for m in graph[n]:
            if color[m] == GRAY:
                raise ValidationError(
                    f"rule cycle: {' -> '.join(stack + [n, m])}"
                )
            if color[m] == WHITE:
                dfs(m, stack + [n])
        color[n] = BLACK

    for n in graph:
        if color[n] == WHITE:
            dfs(n, [])
