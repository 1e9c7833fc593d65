"""dbt manifest integration — resolve refs/selectors against a dbt
`manifest.json` and surface model lineage as a Spark edge DataFrame.

Semantics parity with /root/reference/baselinr/integrations/dbt/
{manifest_parser.py,selector_resolver.py} (~600 LoC): resolve_ref
(manifest_parser.py:97-133 — name match, optional package pin, alias
over name), model_to_table (:196-209), extract_lineage (:210-243 —
model-to-model edges only), selector grammar (selector_resolver.py:
25-144 — tag:/config.materialized:/path:/package:/name:/bare-name
simple selectors, '+' union, ',' intersection).

Spark-first addition: `lineage_edges_df` emits the manifest lineage in
the (upstream_table, downstream_table, lineage_type, confidence_score)
shape every lineage operator in this repo consumes
(operators/lineage_impact.py, operators/graph_export.py,
query/lineage.py) — a dbt project's DAG drops straight into impact
scoring and graph export. Parsing is driver-side by design: a dbt
manifest is metadata (thousands of nodes, not corpus-scale).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

__all__ = ["DBTManifestParser", "DBTSelectorResolver", "lineage_edges_df"]


class DBTManifestParser:
    """Load and query a dbt manifest.json."""

    def __init__(self, manifest_path: str | None = None,
                 project_path: str | None = None) -> None:
        self.manifest_path = manifest_path
        self.project_path = project_path
        self._manifest: dict | None = None
        if manifest_path:
            self.load_manifest(manifest_path)

    def load_manifest(self, manifest_path: str | None = None) -> dict:
        path = manifest_path or self.manifest_path
        if path is None and self.project_path:
            path = os.path.join(self.project_path, "target", "manifest.json")
        if not path or not os.path.exists(path):
            raise FileNotFoundError(f"dbt manifest not found: {path!r}")
        with open(path) as f:
            self._manifest = json.load(f)
        self.manifest_path = path
        return self._manifest

    def get_manifest(self) -> dict:
        if self._manifest is None:
            return self.load_manifest()
        return self._manifest

    def _models(self) -> list[dict]:
        nodes = self.get_manifest().get("nodes", {})
        return [n for n in nodes.values()
                if n.get("resource_type") == "model"]

    def resolve_ref(self, model_name: str,
                    package: str | None = None) -> Optional[tuple[str, str]]:
        """(schema, alias-or-name) for a ref() target, else None."""
        for node in self._models():
            if node.get("name") != model_name:
                continue
            if package and node.get("package_name") != package:
                continue
            return (node.get("schema", ""),
                    node.get("alias") or node.get("name", ""))
        return None

    def get_models_by_tag(self, tag: str) -> list[dict]:
        return [m for m in self._models()
                if isinstance(m.get("tags"), list) and tag in m["tags"]]

    def get_all_models(self) -> list[dict]:
        return self._models()

    def get_model_by_name(self, model_name: str,
                          package: str | None = None) -> dict | None:
        for node in self._models():
            if node.get("name") == model_name and (
                not package or node.get("package_name") == package
            ):
                return node
        return None

    def model_to_table(self, model: dict) -> tuple[str, str]:
        return (model.get("schema", ""),
                model.get("alias") or model.get("name", ""))

    def extract_lineage(self) -> dict[str, list[tuple[str, str]]]:
        """downstream 'schema.table' → upstream (schema, table) list;
        model-to-model edges only, like the reference."""
        nodes = self.get_manifest().get("nodes", {})
        lineage: dict[str, list[tuple[str, str]]] = {}
        for node in nodes.values():
            if node.get("resource_type") != "model":
                continue
            d_schema, d_table = self.model_to_table(node)
            ups = []
            for dep_id in node.get("depends_on", {}).get("nodes", []):
                dep = nodes.get(dep_id)
                if dep and dep.get("resource_type") == "model":
                    ups.append(self.model_to_table(dep))
            if ups:
                lineage[f"{d_schema}.{d_table}"] = ups
        return lineage

    def get_model_dependencies(
        self, model_name: str, package: str | None = None
    ) -> list[tuple[str, str]]:
        model = self.get_model_by_name(model_name, package)
        if not model:
            return []
        nodes = self.get_manifest().get("nodes", {})
        out = []
        for dep_id in model.get("depends_on", {}).get("nodes", []):
            dep = nodes.get(dep_id)
            if dep and dep.get("resource_type") == "model":
                out.append(self.model_to_table(dep))
        return out


class DBTSelectorResolver:
    """dbt selector expressions → model lists (reference grammar:
    simple selectors, '+' union, ',' intersection)."""

    def __init__(self, manifest_parser: DBTManifestParser) -> None:
        self.manifest_parser = manifest_parser

    def resolve_selector(self, selector: str) -> list[dict]:
        all_models = self.manifest_parser.get_all_models()
        model_map = {m.get("unique_id", ""): m for m in all_models}
        if "+" in selector:
            ids: set[str] = set()
            for part in selector.split("+"):
                ids.update(m.get("unique_id", "") for m in
                           self._resolve_simple(part.strip(), all_models))
            return [model_map[u] for u in sorted(ids) if u in model_map]
        if "," in selector:
            parts = [p.strip() for p in selector.split(",")]
            ids = {m.get("unique_id", "") for m in
                   self._resolve_simple(parts[0], all_models)}
            for part in parts[1:]:
                ids &= {m.get("unique_id", "") for m in
                        self._resolve_simple(part, all_models)}
            return [model_map[u] for u in sorted(ids) if u in model_map]
        return self._resolve_simple(selector.strip(), all_models)

    def _resolve_simple(self, selector: str,
                        all_models: list[dict]) -> list[dict]:
        if selector.startswith("tag:"):
            tag = selector[4:].strip()
            return [m for m in all_models if tag in m.get("tags", [])]
        if selector.startswith("config.materialized:") or \
                "materialized:" in selector:
            mat = selector.split(":", 1)[1].strip()
            return [m for m in all_models
                    if m.get("config", {}).get("materialized") == mat]
        if selector.startswith("path:"):
            prefix = selector[5:].strip()
            return [m for m in all_models
                    if m.get("original_file_path", "").startswith(prefix)]
        if selector.startswith("package:"):
            pkg = selector[8:].strip()
            return [m for m in all_models if m.get("package_name") == pkg]
        if selector.startswith("name:"):
            name = selector[5:].strip()
            return [m for m in all_models if m.get("name") == name]
        return [m for m in all_models if m.get("name") == selector]


def lineage_edges_df(spark, parser: DBTManifestParser):
    """Manifest lineage as the repo's canonical edge DataFrame:
    (upstream_table, downstream_table, lineage_type='dbt',
    confidence_score=1.0) — plugs into lineage_impact / graph export /
    upstream-downstream traversal unchanged."""
    rows = []
    for downstream, ups in sorted(parser.extract_lineage().items()):
        for schema, table in ups:
            rows.append((f"{schema}.{table}", downstream, "dbt", 1.0))
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["upstream_table", "downstream_table",
                       "lineage_type", "confidence_score"],
    )
    return spark.createDataFrame(
        pdf,
        schema="upstream_table string, downstream_table string, "
               "lineage_type string, confidence_score double",
    )
