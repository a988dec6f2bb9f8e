"""Single-process pure-Python oracle implementing the reference's
two-pass import semantics over a transcript fixture — the analog of
cimpy's pickled golden (tests/create_pickle_dump.py:10-24) used to
grade the distributed pipeline at P/R ≥ 0.95.

Deliberately written the way the reference works — per-row loops,
dicts, mutable state (cimpy/cimimport.py:84-372) — so it shares no
code path with the Spark pipeline:

- EVERY «…» mention in a turn is processed in order (the reference
  loops over every child element of every subject,
  cimpy/cimimport.py:234-241); stable processing order is
  (conv_id, turn_idx, mention_idx) — the file/element order analog;
- pass 1: declarations instantiate typed entities, first declaration
  wins the type (cimpy/cimimport.py:141,150-151);
- pass 2: literal/enum attribute updates are LAST-wins — the
  reference's unconditional setattr per parsed element
  (cimpy/cimimport.py:255-273); references resolved against the dict,
  dangling → counted quarantine (cimpy/cimimport.py:281-288);
  many-valued references deduped on append (:294-300); enum values
  keep the suffix after the last '.' (:334-345);
- sameAs links feed a union-find; canonical id = min of component
  (the cross-profile merge of cimpy/cimimport.py:215-231 generalized).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_MENTION = re.compile(r"«([^«»]*)»")
_DECL = re.compile(r"^decl (E\d+) type:(T\d+)((?: \w+=[^ ]+)*)$")
_ABOUT = re.compile(r"^about (E\d+)((?: \w+=[^ ]+)*)$")
_REL = re.compile(r"^rel (E\d+) (\w+) ([EX]\d+)$")
_SAME = re.compile(r"^same (E\d+) (E\d+)$")
_ATTR = re.compile(r"(\w+)=([^ ]+)")
_ENUM = re.compile(r"^kind:\w+\.(\w+)$")


@dataclass
class OracleResult:
    triples: set  # raw (subj, pred, obj, obj_kind)
    entities: dict  # entity_id -> type
    edges: set  # resolved (src, pred, dst)
    canon_edges: set  # canonicalized (src, pred, dst)
    nodes: set  # canonical (entity_id, attr, value)
    cmap: dict  # entity_id -> canonical_id
    quarantine: dict = field(default_factory=dict)  # dangling dst -> count
    unknown_patterns: int = 0


class _UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id wins as the root (canonical election rule)
            lo, hi = sorted((ra, rb))
            self.parent[hi] = lo


def _mentions(rows: list[dict]):
    """Yield mention bodies in stable (conv_id, turn_idx, mention_idx)
    order."""
    ordered = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
    for r in ordered:
        for m in _MENTION.finditer(r["text"] or ""):
            yield m.group(1)


def run_oracle(rows: list[dict]) -> OracleResult:
    """rows: transcript dicts with conv_id, turn_idx, text (role/ts
    ignored here). Stable order = (conv_id, turn_idx, mention_idx)."""
    triples: set = set()
    entities: dict[str, str] = {}
    attrs: dict[tuple[str, str], str] = {}  # (entity, attr) -> last value
    raw_refs: list[tuple[str, str, str]] = []
    sames: list[tuple[str, str]] = []
    unknown = 0

    # pass 1+2 over parsed mentions (our grammar has no intra-turn
    # ordering subtleties beyond attr overwrite order; forward
    # references are deferred to the resolution step below, mirroring
    # the reference's second pass)
    for body in _mentions(rows):
        d = _DECL.match(body)
        if d:
            subj, typ, attrstr = d.group(1), d.group(2), d.group(3)
            if subj not in entities:
                entities[subj] = typ  # first declaration wins the type
            triples.add((subj, "rdf_type", typ, "type"))
            for k, v in _ATTR.findall(attrstr):
                e = _ENUM.match(v)
                if e:
                    triples.add((subj, k, e.group(1), "enum"))
                    attrs[(subj, k)] = e.group(1)  # setattr: last wins
                else:
                    triples.add((subj, k, v, "literal"))
                    attrs[(subj, k)] = v
            continue
        a = _ABOUT.match(body)
        if a:
            subj, attrstr = a.group(1), a.group(2)
            for k, v in _ATTR.findall(attrstr):
                e = _ENUM.match(v)
                if e:
                    triples.add((subj, k, e.group(1), "enum"))
                    attrs[(subj, k)] = e.group(1)
                else:
                    triples.add((subj, k, v, "literal"))
                    attrs[(subj, k)] = v
            continue
        rel = _REL.match(body)
        if rel:
            triples.add((rel.group(1), rel.group(2), rel.group(3), "ref"))
            raw_refs.append((rel.group(1), rel.group(2), rel.group(3)))
            continue
        s = _SAME.match(body)
        if s:
            triples.add((s.group(1), "sameAs", s.group(2), "ref"))
            sames.append((s.group(1), s.group(2)))
            continue
        unknown += 1

    # reference resolution (second pass): dict lookup, dangling counted
    edges: set = set()
    quarantine: dict[str, int] = {}
    for src, pred, dst in raw_refs:
        if dst in entities:
            edges.add((src, pred, dst))  # set => append-dedupe
        else:
            quarantine[dst] = quarantine.get(dst, 0) + 1

    # canonicalization: union-find over sameAs
    uf = _UnionFind()
    for e in entities:
        uf.find(e)
    for a_, b_ in sames:
        uf.union(a_, b_)
    cmap = {e: uf.find(e) for e in entities}

    canon_edges = {
        (cmap[s], p, cmap[d]) for s, p, d in edges if s in cmap and d in cmap
    }

    # canonical node attrs: replay in stable order against canonical
    # ids — type first-wins, literal/enum last-wins (setattr semantics)
    nodes: dict[tuple[str, str], str] = {}
    for body in _mentions(rows):
        d = _DECL.match(body)
        a = _ABOUT.match(body)
        subj = attrstr = None
        if d:
            subj, attrstr = d.group(1), d.group(3)
        elif a:
            subj, attrstr = a.group(1), a.group(2)
        if subj is None or subj not in cmap:
            continue
        canon = cmap[subj]
        if d:
            nodes.setdefault((canon, "rdf_type"), d.group(2))  # first wins
        for k, v in _ATTR.findall(attrstr):
            e = _ENUM.match(v)
            nodes[(canon, k)] = e.group(1) if e else v  # last wins

    return OracleResult(
        triples=triples,
        entities=entities,
        edges=edges,
        canon_edges=canon_edges,
        nodes={(k[0], k[1], v) for k, v in nodes.items()},
        cmap=cmap,
        quarantine=quarantine,
        unknown_patterns=unknown,
    )


def precision_recall(emitted: set, expected: set) -> tuple[float, float]:
    if not emitted and not expected:
        return (1.0, 1.0)
    if not emitted or not expected:
        return (0.0, 0.0)
    tp = len(emitted & expected)
    return tp / len(emitted), tp / len(expected)
