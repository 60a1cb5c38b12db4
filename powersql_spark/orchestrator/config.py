"""Project config: powersql.toml (reference src/main.rs:19-28, 323-328).

Same file format as the reference:

    [project]
    name = "project_1"
    models = ["models"]
    tests = ["tests"]
    sources = "/data/parquet"   # engine extension, see below

``sources`` (optional) names a directory of parquet source tables to
register before analysis/execution — the Spark analog of the
reference's backend-connection env vars (src/execute.rs:52-56): where
PowerSQL's external tables simply already live in the warehouse, Spark
needs them registered in the session catalog. A relative path resolves
against the project dir; the CLI's --sources overrides it.

``sources_schema`` (optional) names a JSON file mapping source table
name -> DDL column list ("col TYPE, col TYPE"). ``check`` / ``explain``
fall back to it when no source data is present, registering EMPTY
typed relations — restoring the reference's data-free static
type-check ergonomics (src/types.rs:47-221 runs on the AST
environment, no warehouse connection needed).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class PowerSqlConfig:
    name: str
    models: list[str]
    tests: list[str] = field(default_factory=list)
    root: Path = Path(".")
    sources: str | None = None
    sources_schema: str | None = None

    def sources_dir(self) -> str | None:
        if self.sources is None:
            return None
        p = Path(self.sources)
        return str(p if p.is_absolute() else self.root / p)

    def sources_schema_path(self) -> str | None:
        if self.sources_schema is None:
            return None
        p = Path(self.sources_schema)
        return str(p if p.is_absolute() else self.root / p)

    def model_files(self) -> list[Path]:
        """Recursive walk of model dirs for *.sql (src/main.rs:331-342)."""
        return _find_sql(self.root, self.models)

    def test_files(self) -> list[Path]:
        """Same for test dirs (src/main.rs:289-306)."""
        return _find_sql(self.root, self.tests)


def _find_sql(root: Path, dirs: list[str]) -> list[Path]:
    out: list[Path] = []
    for d in dirs:
        out.extend(sorted((root / d).rglob("*.sql")))
    return out


def load_config(project_dir: str | Path) -> PowerSqlConfig:
    root = Path(project_dir)
    path = root / "powersql.toml"
    with open(path, "rb") as f:
        data = tomllib.load(f)
    project = data["project"]
    return PowerSqlConfig(
        name=project["name"],
        models=list(project.get("models", [])),
        tests=list(project.get("tests", [])),
        root=root,
        sources=project.get("sources"),
        sources_schema=project.get("sources_schema"),
    )
