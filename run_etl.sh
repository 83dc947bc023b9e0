#!/bin/bash
# Twin of the reference's run_etl.sh (reference run_etl.sh:4-7): activate
# an optional virtualenv, then invoke the ETL CLI, forwarding all args.
set -euo pipefail

# Optional venv — the reference hardcodes its path; we take an env var.
if [ -n "${ETL_VENV:-}" ] && [ -f "${ETL_VENV}/bin/activate" ]; then
    # shellcheck disable=SC1091
    source "${ETL_VENV}/bin/activate"
fi

exec python -m database_to_bigquery_spark.etl "$@"
