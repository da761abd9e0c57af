"""Job-audit sink: the reference's ``log_to_sql_db`` contract
(``ElasticSearch ETL.py:271-299``) rebuilt as an append-only audit table.

One row per job run / micro-batch with job name, id, start/end timestamps,
SUCCESS/FAILED status, batch id, table name, and loaded record count —
written in both the success and failure paths. The sink is a parquet
directory here (swap ``format`` for "jdbc"/"delta" in a deployment); audit
writes are tiny and driver-side, so a single-row append per batch is fine
at any scale.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

AUDIT_SCHEMA = (
    "job_name string, job_id long, executable_cmd string, start_ts timestamp, "
    "end_ts timestamp, job_status string, error_desc string, error_log_file string, "
    "batch_id string, table_name string, record_count_loaded long"
)


@dataclass
class AuditLog:
    spark: SparkSession
    path: str
    job_name: str = "Initial_load_from_elasticsearch"
    job_id: int = 8
    executable_cmd: str = "elasticsearch_data_export"
    table_name: str = "rta_claim_headers"

    def log(
        self,
        start_ts: datetime.datetime,
        end_ts: datetime.datetime,
        job_status: str,
        batch_id: str,
        record_count_loaded: Optional[int] = None,
        error_desc: Optional[str] = None,
        error_log_file: Optional[str] = None,
    ) -> None:
        row = [
            (
                self.job_name,
                self.job_id,
                self.executable_cmd,
                start_ts,
                end_ts,
                job_status,
                error_desc,
                error_log_file,
                batch_id,
                self.table_name,
                record_count_loaded,
            )
        ]
        df = self.spark.createDataFrame(row, AUDIT_SCHEMA)
        df.write.mode("append").parquet(self.path)

    def success(self, start_ts, batch_id, record_count):
        self.log(
            start_ts,
            datetime.datetime.now(datetime.timezone.utc),
            "SUCCESS",
            batch_id,
            record_count_loaded=record_count,
        )

    def failure(self, start_ts, batch_id, error: Exception):
        # Failure rows omit record_count_loaded, like the reference's except
        # path (``ElasticSearch ETL.py:289-299``).
        self.log(
            start_ts,
            datetime.datetime.now(datetime.timezone.utc),
            "FAILED",
            batch_id,
            error_desc=str(error),
        )

    def read(self) -> DataFrame:
        return self.spark.read.schema(AUDIT_SCHEMA).parquet(self.path)
