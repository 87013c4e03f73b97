"""Model catalog (reference ``gds.model.list/exists/drop`` +
``gds.model.store/load`` — SURVEY.md §2.D ML family;
⟦`model-catalog-api/…`⟧).

Same copy-on-write layout discipline as the graph catalog
(catalog.py): each model is a directory with a ``model.json`` manifest
(type + scalar params + schema) plus zero or more parquet artifact
tables (e.g. a Node2Vec embedding table, K-Means assignments). The
manifest write is last, so a half-written model is never listable — the
atomicity story a real deployment gets from Iceberg commits.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class ModelCatalog:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta(self, name: str) -> str:
        return os.path.join(self._dir(name), "model.json")

    def exists(self, name: str) -> bool:
        return os.path.exists(self._meta(name))

    def list(self) -> list[dict]:
        out = []
        if os.path.isdir(self.root):
            for name in sorted(os.listdir(self.root)):
                if self.exists(name):
                    with open(self._meta(name)) as f:
                        out.append(json.load(f))
        return out

    def drop(self, name: str) -> bool:
        if not self.exists(name):
            return False
        shutil.rmtree(self._dir(name))
        return True

    def store(
        self,
        name: str,
        model_type: str,
        params: dict[str, Any],
        artifacts: dict[str, DataFrame] | None = None,
    ) -> dict:
        """``params`` must be JSON-serializable (weights, config).
        ``artifacts`` are DataFrame-valued parts written as parquet."""
        d = self._dir(name)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d)
        art_names = []
        for art, df in (artifacts or {}).items():
            df.write.mode("overwrite").parquet(os.path.join(d, f"{art}.parquet"))
            art_names.append(art)
        meta = {
            "name": name,
            "type": model_type,
            "params": params,
            "artifacts": sorted(art_names),
        }
        with open(self._meta(name), "w") as f:  # manifest last = commit
            json.dump(meta, f, indent=1)
        return meta

    def load(self, name: str) -> tuple[dict, dict[str, DataFrame]]:
        with open(self._meta(name)) as f:
            meta = json.load(f)
        arts = {
            a: self.spark.read.parquet(os.path.join(self._dir(name), f"{a}.parquet"))
            for a in meta["artifacts"]
        }
        return meta, arts
