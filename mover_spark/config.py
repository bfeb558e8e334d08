"""mover config.json — parsed verbatim (drop-in compatible).

Field names match the reference's JSON tags exactly
(/root/reference/config/config.go:11-52): top-level {locale, schema, extra};
schema entries {table_name, omit_reference_keys, reference_keys, queries,
columns}; columns {name, fake, unique, replace, sanitize, download};
queries {table_name, query}; download {type, http:{base_url}}.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from .operators.closure import SchemaConfig
from .operators.sanitize import ColumnRule


@dataclass
class MoverConfig:
    locale: str = ""
    schema: list[dict] = field(default_factory=list)
    extra: list[dict] = field(default_factory=list)

    @classmethod
    def load(cls, path: str | None = None) -> "MoverConfig":
        """Load from path or $MOVER_CONF (cmd/mover/main.go:53-57)."""
        path = path or os.environ.get("MOVER_CONF")
        if not path:
            return cls()
        with open(path) as f:
            raw = json.load(f)
        return cls(
            locale=raw.get("locale", ""),
            schema=raw.get("schema", []) or [],
            extra=raw.get("extra", []) or [],
        )

    def schema_configs(self) -> dict[str, SchemaConfig]:
        """Closure-engine view of the config (config/config.go:39-46)."""
        out: dict[str, SchemaConfig] = {}
        for s in self.schema:
            out[s["table_name"]] = SchemaConfig(
                table_name=s["table_name"],
                omit_reference_keys=bool(s.get("omit_reference_keys", False)),
                reference_keys=list(s.get("reference_keys", []) or []),
                queries=[(q["table_name"], q["query"]) for q in s.get("queries", []) or []],
            )
        return out

    def column_rules(self, table: str) -> list[ColumnRule]:
        """Sanitizer view of one table's config (config/config.go:30-37).

        Duplicate table_name entries resolve LAST-entry-wins, matching
        schema_configs' dict overwrite — an early return here made the
        two views read DIFFERENT entries of the same half-duplicated
        config (closure behavior from the last, sanitize rules from the
        first), a silent half-merge."""
        rules: list[ColumnRule] = []
        for s in self.schema:
            if s["table_name"] == table:
                rules = [
                    ColumnRule(
                        name=c["name"],
                        fake=c.get("fake", "") or "",
                        unique=bool(c.get("unique", False)),
                        replace=c.get("replace"),
                        sanitize=bool(c.get("sanitize", False)),
                        download=c.get("download"),
                    )
                    for c in s.get("columns", []) or []
                ]
        return rules

    def extra_tables(self) -> list[str]:
        """Tables to always full-scan (etl/engine.go:117-125)."""
        return [s["table_name"] for s in self.extra]
