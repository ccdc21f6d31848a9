"""JSON job-spec surface for the filtered path algorithms.

Replicates the reference's two JSON config contracts:

* ``rings.property_filter`` — RingsDetectionWithFilter
  (/root/reference/computer-algorithm/.../rings/filter/
  RingsDetectionFilterDescribe.java:33-46): three groups
  ``start_vertex_filter`` / ``vertex_filter`` / ``edge_filter``, each a
  list of ``{"label": ..., "property_filter": "<aviator expr>"}``
  (PropertyFilterDescribe.java:25-46).
* ``links.analyze_config`` — Links
  (/root/reference/computer-algorithm/.../links/
  LinksConditionDescribe.java:33-60): ``start_vertexes`` (required) plus
  ``vertex_end_condition`` / ``edge_end_condition`` /
  ``edge_compare_condition`` single PropertyFilterDescribe objects.

Aviator expressions are translated to vectorized :class:`expr.Predicate`
sources: ``$out.weight`` / ``$in.weight`` become the engine's edge
weight columns, ``$element.<name>`` becomes the bound vertex column
(the engine exposes ``node``), ``double(x)`` is a no-op cast (weights
are float64 already), and flat ``&&`` / ``||`` / ``!`` chains become
numpy ``&`` / ``|`` / ``~`` with each clause parenthesized. Anything
outside that grammar raises — predicates come from the job author
(same trust model as Aviator).

Deviation (documented): the engine's graphs are single-label, so the
``label`` field is accepted and recorded but does not partition the
filter — every entry applies. The reference's label-only filtering
(an entry with no ``property_filter`` admitting one label) has no
engine analog.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

import numpy as np

from .expr import Predicate

_LOGIC_SPLIT = re.compile(r"\s*(\|\||&&)\s*")


def translate_aviator(expression: str, out_name: str = "w_out",
                      in_name: str = "w_in") -> str:
    """Aviator property-filter string -> Predicate source string."""
    s = expression.strip()
    s = re.sub(r"\bdouble\s*\(", "(", s)

    def prop(m: re.Match, name: str) -> str:
        if m.group(1) != "weight":
            raise ValueError(
                f"engine edges carry a single property 'weight'; "
                f"got ${m.group(0)!r}")
        return name

    s = re.sub(r"\$out\.(\w+)", lambda m: prop(m, out_name), s)
    s = re.sub(r"\$in\.(\w+)", lambda m: prop(m, in_name), s)
    s = re.sub(r"\$element\.(\w+)", r"\1", s)
    parts = _LOGIC_SPLIT.split(s)
    if len(parts) > 1:
        s = " ".join({"&&": "&", "||": "|"}.get(p, f"({p})")
                     for p in parts)
    s = re.sub(r"(?<![=!<>])!(?![=])", "~", s)
    return s


def _all_true(n: int) -> np.ndarray:
    return np.ones(n, dtype=bool)


@dataclass
class RingsFilterSpec:
    """Compiled rings.property_filter. Empty groups pass everything
    (RingsDetectionSpreadFilter.init puts a null '*' entry)."""

    start_vertex: list[Predicate] = field(default_factory=list)
    vertex: list[Predicate] = field(default_factory=list)
    #: (predicate, uses_in): expressions referencing $in are skipped at
    #: superstep 0 where no walked edge exists yet
    #: (RingsDetectionSpreadFilter.filter(Edge):106-118).
    edge: list[tuple[Predicate, bool]] = field(default_factory=list)

    def start_mask(self, node: np.ndarray) -> np.ndarray:
        m = _all_true(len(node))
        for p in self.start_vertex:
            m &= p(node=node)
        return m

    def vertex_mask(self, node: np.ndarray) -> np.ndarray:
        m = _all_true(len(node))
        for p in self.vertex:
            m &= p(node=node)
        return m

    def edge_mask0(self, w_out: np.ndarray) -> np.ndarray:
        m = _all_true(len(w_out))
        for p, uses_in in self.edge:
            if not uses_in:
                m &= p(w_out=w_out)
        return m

    def edge_mask(self, w_out: np.ndarray,
                  w_in: np.ndarray) -> np.ndarray:
        m = _all_true(len(w_out))
        for p, _ in self.edge:
            m &= p(w_out=w_out, w_in=w_in)
        return m


def parse_rings_filter(describe: str) -> RingsFilterSpec:
    """JSON string (the reference's rings.property_filter value) ->
    compiled RingsFilterSpec."""
    d = json.loads(describe or "{}")
    spec = RingsFilterSpec()
    for key, sink in (("start_vertex_filter", spec.start_vertex),
                      ("vertex_filter", spec.vertex)):
        for entry in d.get(key) or []:
            f = entry.get("property_filter")
            if f:
                sink.append(Predicate(translate_aviator(f)))
    for entry in d.get("edge_filter") or []:
        f = entry.get("property_filter")
        if f:
            spec.edge.append((Predicate(translate_aviator(f)),
                              "$in" in f))
    return spec


@dataclass
class LinksConfig:
    """Parsed links.analyze_config: raw start ids (caller maps them to
    v_ids via the graph dictionary) + translated predicate sources
    matching the links() keyword arguments."""

    start_vertexes: list
    spread: str | None       # edge_compare_condition (w_out / w_in)
    end_edge: str | None     # edge_end_condition (column: w)
    end_vertex: str | None   # vertex_end_condition (column: node)


def parse_links_config(describe: str) -> LinksConfig:
    d = json.loads(describe)
    starts = d.get("start_vertexes")
    if not starts:
        raise ValueError("start_vertexes must not be empty "
                         "(LinksConditionDescribe.java:51-52)")
    vec = d.get("vertex_end_condition")
    eec = d.get("edge_end_condition")
    if vec is None and eec is None:
        raise ValueError("vertex_end_condition and edge_end_condition "
                         "can't all be null "
                         "(LinksConditionDescribe.java:54-56)")
    ecc = d.get("edge_compare_condition")

    def pf(entry, **kw):
        if entry is None or not entry.get("property_filter"):
            return None
        return translate_aviator(entry["property_filter"], **kw)

    return LinksConfig(
        start_vertexes=list(starts),
        spread=pf(ecc),
        end_edge=pf(eec, out_name="w"),
        end_vertex=pf(vec))
