"""Project config: powersql.toml (reference src/main.rs:19-28, 323-328).

Same file format as the reference:

    [project]
    name = "project_1"
    models = ["models"]
    tests = ["tests"]
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
    )
