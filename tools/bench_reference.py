#!/usr/bin/env python3
"""Single-node throughput of the REFERENCE's own hot-path code, for the
BASELINE comparison ("matches-or-beats the reference's single-node
throughput"). Runs the reference textifier (entity_to_text) and statement
extractor (entity_to_statements) over synthetic entities with label lookups
served from an in-memory dict — i.e. STRICTLY FASTER than the reference's
real SQLite point reads, so the comparison favors the reference.

Usage: PYTHONHASHSEED=0 python3 tools/bench_reference.py [n_entities]
"""
import ast
import json
import random
import sys
import time
import types

REF = "/root/reference"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000

# ---- stubs (same approach as gen_goldens.py) ------------------------------
LABELS = {f"P{i}": f"property {i}" for i in range(1, 50)}
LABELS.update({f"Q{i}": f"entity label {i}" for i in range(1, 2000)})

sys.path.insert(0, f"{REF}/src")
requests_stub = types.ModuleType("requests")
sys.modules["requests"] = requests_stub


class StubEntity:
    __slots__ = ("id", "label", "description", "aliases", "claims")

    def __init__(self, id, label, description="", aliases=None, claims=None):
        self.id, self.label, self.description = id, label, description
        self.aliases = aliases or []
        self.claims = claims or {}


class StubWikidataEntity:
    @staticmethod
    def get_entity(id):
        lbl = LABELS.get(id)
        return StubEntity(id, lbl) if lbl is not None else None


db_stub = types.ModuleType("wikidataDB")
db_stub.WikidataEntity = StubWikidataEntity
sys.modules["wikidataDB"] = db_stub

import wikidataEmbed  # noqa: E402  (the real reference textifier)


def extract(path, names):
    tree = ast.parse(open(path).read())
    fns = [n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in names]
    return ast.unparse(ast.Module(body=fns, type_ignores=[]))


st_src = extract(f"{REF}/experimental_run_scripts/wikidata_datadump_statement_textification.py",
                 ["entity_to_statements"])
st_src = st_src.replace("qid_label = query_label(conn, qid_, field='qid')",
                        "qid_label = query_label(conn, qid_, field='qid')[1]")
import uuid as uuid_mod


def query_label(conn, qpid, field="qid"):
    lbl = LABELS.get(qpid)
    return (qpid, lbl) if lbl is not None else None


st_ns = {"query_label": query_label, "uuid": uuid_mod}
exec(st_src, st_ns)
entity_to_statements = st_ns["entity_to_statements"]

# ---- synthetic entities (same claim mix as the graft pages corpus) --------
rnd = random.Random(42)


def make_raw(i):
    def item(q):
        return {"snaktype": "value", "datatype": "wikibase-item",
                "datavalue": {"value": {"id": q}, "type": "e"}}
    def qty(a):
        return {"snaktype": "value", "datatype": "quantity",
                "datavalue": {"value": {"amount": a, "unit": "1"}, "type": "q"}}
    def tim(t, p):
        return {"snaktype": "value", "datatype": "time",
                "datavalue": {"value": {"time": t, "precision": p,
                                        "calendarmodel": "http://www.wikidata.org/entity/Q1985727"}, "type": "t"}}
    def mono(s):
        return {"snaktype": "value", "datatype": "monolingualtext",
                "datavalue": {"value": {"text": s, "language": "en"}, "type": "m"}}
    claims = {
        "P1": [{"type": "statement", "rank": "normal", "mainsnak": item(f"Q{1 + i % 1500}")}],
        "P2": [{"type": "statement", "rank": "normal", "mainsnak": item(f"Q{1 + (i * 7) % 1500}"),
                "qualifiers": {"P3": [tim(f"+19{50 + i % 49}-01-01T00:00:00Z", 9)]}}],
        "P4": [{"type": "statement", "rank": "normal", "mainsnak": qty(f"+{1000 + i}")}],
        "P5": [{"type": "statement", "rank": "normal", "mainsnak": tim(f"+1{200 + i % 799}-03-1{i % 9}T00:00:00Z", 11)}],
        "P6": [{"type": "statement", "rank": "normal", "mainsnak": mono(f"The Official Entity {i}")}],
        "P7": [{"type": "statement", "rank": "normal", "mainsnak":
                {"snaktype": "value", "datatype": "string",
                 "datavalue": {"value": f'note "quoted" fact {i}', "type": "s"}}}],
    }
    return {"id": f"Q{100000 + i}", "type": "item",
            "labels": {"en": {"value": f"Entity {i}"}},
            "descriptions": {"en": {"value": f"synthetic entity number {i}"}},
            "aliases": {}, "sitelinks": {"enwiki": {"title": f"E{i}"}},
            "claims": claims}


raws = [make_raw(i) for i in range(N)]
LABELS.update({r["id"]: r["labels"]["en"]["value"] for r in raws})
# normalized stub entities for the textifier (claims as parsed dicts)
norm = [StubEntity(r["id"], r["labels"]["en"]["value"],
                   r["descriptions"]["en"]["value"], [], r["claims"]) for r in raws]

textifier = wikidataEmbed.WikidataTextifier(language="en")

t0 = time.time()
total_chars = 0
for e in norm:
    total_chars += len(textifier.entity_to_text(e))
t_text = time.time() - t0

t0 = time.time()
n_triples = 0
conn = object()
for r in raws:
    n_triples += len(entity_to_statements(r, conn=conn, lang="en"))
t_stmt = time.time() - t0

print(json.dumps({
    "metric": "reference_single_process",
    "n_entities": N,
    "textify_sec": round(t_text, 2),
    "textify_docs_per_sec": round(N / t_text, 1),
    "statements_sec": round(t_stmt, 2),
    "statement_docs_per_sec": round(N / t_stmt, 1),
    "n_triples": n_triples,
    "total_chars": total_chars,
}))
