"""Replication planner — the reference's data-migrator capability as a
deterministic function (no LLM).

The reference's agent reads the latest scan, extracts
``database_name / schema_tables / replication_mode /
destination_database`` with documented assumptions for everything not
discoverable ("postgres"/"public" defaults, ordering keys —
``src/prompts/data_migrator.py:25-37``), and calls ``create_clickpipe``
to flatten ``schema_tables`` into ``tableMappings``
(``src/tools/data_migrator.py:46-55``). Its eval is a field-exact
compare of that config (``eval/data_migrator/eval.py:69-123``).

Here the same derivation is pure Python over our scanner's output
(same JSON shape), and the plan bridges directly into the Spark
replication layer (``sources/replication.py``) instead of a ClickPipe
curl — we replicate the *semantics* (mode + mappings + assumptions),
not the Cloud API payload (SURVEY §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from clickhouse_build_spark.sources.replication import ReplicationMode, TableMapping


@dataclass
class ReplicationPlan:
    """The data-migrator output contract (field names match the
    reference's eval ground truth, ``eval/data_migrator/ground_truth.json``)."""

    database_name: str
    destination_database: str
    replication_mode: str
    schema_tables: dict[str, list[str]]
    table_mappings: list[dict[str, str]]
    assumptions: list[str] = field(default_factory=list)

    def to_mappings(self) -> list[TableMapping]:
        """Bridge into the Spark replication layer."""
        return [
            TableMapping(
                source_schema=m["sourceSchemaName"],
                source_table=m["sourceTable"],
                target_table=m["targetTable"],
            )
            for m in self.table_mappings
        ]

    def as_config(self) -> dict:
        """The engine-level config dict (the reference's ClickPipe
        payload minus the Cloud plumbing)."""
        return {
            "database_name": self.database_name,
            "destination_database": self.destination_database,
            "replication_mode": self.replication_mode,
            "schema_tables": self.schema_tables,
            "table_mappings": self.table_mappings,
            "assumptions": self.assumptions,
        }

    def as_clickpipe(self) -> dict:
        """The reference's LITERAL ClickPipe artifact
        (``src/tools/data_migrator.py:57-99``): the env-templated
        payload plus the envsubst-curl command a user pastes to create
        the pipe. Credentials stay ``${VAR}`` placeholders — the
        command's export preamble names every variable to fill."""
        import json

        payload = {
            "name": f"{self.database_name.title()} Migration",
            "source": {
                "postgres": {
                    "host": "${POSTGRES_HOST}",
                    "port": "${POSTGRES_PORT}",
                    "database": self.database_name,
                    "credentials": {
                        "username": "${POSTGRES_USER}",
                        "password": "${POSTGRES_PASSWORD}",
                    },
                    "settings": {"replicationMode": self.replication_mode},
                    "tableMappings": self.table_mappings,
                }
            },
            "destination": {"database": self.destination_database},
        }
        # the port placeholder must substitute to a JSON number
        payload_json = json.dumps(payload, indent=2).replace(
            '"${POSTGRES_PORT}"', "${POSTGRES_PORT}"
        )
        command = (
            "export ORGANIZATION_ID=<REPLACE_ME>\n"
            "export SERVICE_ID=<REPLACE_ME>\n"
            "export POSTGRES_HOST=<REPLACE_ME>\n"
            "export POSTGRES_PORT=<REPLACE_ME>\n"
            "export POSTGRES_USER=<REPLACE_ME>\n"
            "export POSTGRES_PASSWORD=<REPLACE_ME>\n"
            "\n"
            "envsubst <<'EOF' | curl -X POST "
            '"https://api.clickhouse.cloud/v1/organizations/'
            '$ORGANIZATION_ID/services/$SERVICE_ID/clickpipes/" \\\n'
            "  --header 'Authorization: Basic (...)' \\\n"
            "  --header 'Content-Type: application/json' \\\n"
            "  --data @-\n"
            f"{payload_json}\n"
            "EOF"
        )
        return {"payload": payload, "command": command}


def plan_replication(
    scan: "dict | object",
    replication_mode: ReplicationMode | str = ReplicationMode.CDC,
    database_name: str | None = None,
    schema: str | None = None,
    destination_database: str | None = None,
) -> ReplicationPlan:
    """Scan result → replication plan, with the reference's assumption
    discipline: every non-discoverable value gets its documented
    default AND an assumption entry the caller can audit.

    Defaults mirror ``src/prompts/data_migrator.py:25-27``: database
    "postgres", schema "public"; destination follows the source
    database name (the reference's eval ground truth expects
    destination == source for the fixture apps).
    """
    mode = ReplicationMode(replication_mode)
    assumptions: list[str] = []
    if database_name is None:
        database_name = "postgres"
        assumptions.append(
            'database name not discoverable from the scan; assuming "postgres"'
        )
    if schema is None:
        schema = "public"
        assumptions.append('schema not discoverable from the scan; assuming "public"')
    if destination_database is None:
        destination_database = database_name
        assumptions.append(
            f'destination database defaulting to source name "{database_name}"'
        )

    # scan is either the scanner's QueryAnalysisResult or its JSON dict
    raw_tables = scan.get("tables", []) if isinstance(scan, dict) else scan.tables
    tables = sorted(set(raw_tables))
    if not tables:
        raise ValueError("scan contains no tables — nothing to replicate")
    schema_tables = {schema: tables}
    table_mappings = [
        {
            "sourceSchemaName": schema,
            "sourceTable": t,
            "targetTable": t,
        }
        for t in tables
    ]
    assumptions.append(
        "ordering keys not declared in the scan; replication layer will "
        "bucket/sort by the caller-provided key columns (see "
        "sources/replication.py assumptions log)"
    )
    return ReplicationPlan(
        database_name=database_name,
        destination_database=destination_database,
        replication_mode=mode.value,
        schema_tables=schema_tables,
        table_mappings=table_mappings,
        assumptions=assumptions,
    )
