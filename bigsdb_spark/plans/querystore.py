"""Query-id registry (SURVEY §2.1 S7).

The reference persists each generated SQL string to a temp "query file"
and re-executes it for pagination and plugin input
(IsolateQueryPage.pm:2130 get_query_from_temp_file). Here the stored
artifact is the typed QuerySpec (JSON), keyed by its content hash —
re-deriving the DataFrame from the spec lets Catalyst re-plan freely
(and the plugin/job service passes query ids instead of row lists).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os

from pyspark.sql import DataFrame

from bigsdb_spark.plans.queryspec import FormRow, QuerySpec, run_query


def _spec_to_dict(spec: QuerySpec) -> dict:
    d = dataclasses.asdict(spec)
    return d


def _spec_from_dict(d: dict) -> QuerySpec:
    rows = [FormRow(**r) for r in d.pop("rows", [])]
    order_by = [tuple(x) for x in d.pop("order_by", [])]
    return QuerySpec(rows=rows, order_by=order_by, **d)


class QueryStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def save(self, spec: QuerySpec) -> str:
        blob = json.dumps(_spec_to_dict(spec), sort_keys=True, default=str)
        qid = hashlib.md5(blob.encode()).hexdigest()[:16]
        with open(os.path.join(self.root, f"{qid}.json"), "w") as fh:
            fh.write(blob)
        return qid

    def load(self, qid: str) -> QuerySpec:
        with open(os.path.join(self.root, f"{qid}.json")) as fh:
            return _spec_from_dict(json.load(fh))

    def run(self, qid: str, view: DataFrame) -> DataFrame:
        return run_query(view, self.load(qid))
