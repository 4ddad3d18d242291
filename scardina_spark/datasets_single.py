"""Shipped single-table dataset declarations — DMV vehicle
registrations and flight-delays, the reference's one-table benchmark
datasets (reference: scardina/datasets.py:425-455 ``load_dmv`` + the
dmv-1/2/5 keep-list variants :457-542, :544-571 ``load_flight_delays``;
selected via the name dispatch at :32-66).

A user with the standard ``dmv.csv`` / ``flight-delays.csv`` export
points :func:`load_dmv` / :func:`load_flight_delays` at the file and
gets exactly the relation the reference trains its single-table UR
models over: the same keep-lists (per variant — the reference comments
columns out, we omit them), the same type casts (``Reg Valid Date`` →
timestamp, ``YEAR_DATE`` → float; everything else stays string, whose
lexicographic order matches the reference's default), and a one-table
:class:`~.schema.SchemaGraph` so ``prep``/``train``/``estimate`` and
the predicate machinery run unchanged — the single-table UR fallback
(a spanning tree with no edges: every weight 1, the join size is the
row count).

Scale notes: both loaders prefer a staged ``<name>.parquet`` next to
the CSV (columnar scan, pruning + pushdown); the CSV read projects the
keep-list at the source.  The DMV export is ~12 M rows — one
splittable text scan is acceptable once, parquet after that.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import load_csv_table
from .schema import SchemaGraph

#: Full DMV keep-list (reference datasets.py:427-440).
DMV_COLUMNS: list[str] = [
    "Record Type",
    "Registration Class",
    "State",
    "County",
    "Body Type",
    "Fuel Type",
    "Reg Valid Date",
    "Color",
    "Scofflaw Indicator",
    "Suspension Indicator",
    "Revocation Indicator",
]

#: Keep-list per variant — the reference's dmv / dmv-1 / dmv-2 / dmv-5
#: column subsets (datasets.py:425, :457, :486, :515; commented-out
#: columns there are omitted here).
DMV_VARIANTS: dict[str, list[str]] = {
    "dmv": DMV_COLUMNS,
    "dmv-1": DMV_COLUMNS[1:],                       # drop Record Type
    "dmv-2": [c for c in DMV_COLUMNS[1:] if c != "County"],
    "dmv-5": DMV_COLUMNS[5:],                       # last 6 columns
}

#: reference type_casts = {"Reg Valid Date": np.datetime64}.
DMV_TYPE_CASTS: dict[str, str] = {"Reg Valid Date": "timestamp"}

#: Flight-delays keep-list (reference datasets.py:546-559).
FLIGHT_DELAYS_COLUMNS: list[str] = [
    "YEAR_DATE",
    "UNIQUE_CARRIER",
    "ORIGIN",
    "ORIGIN_STATE_ABR",
    "DEST",
    "DEST_STATE_ABR",
    "DEP_DELAY",
    "TAXI_OUT",
    "TAXI_IN",
    "ARR_DELAY",
    "AIR_TIME",
    "DISTANCE",
]

#: reference type_casts = {"YEAR_DATE": pa.float32()}.
FLIGHT_DELAYS_TYPE_CASTS: dict[str, str] = {"YEAR_DATE": "float"}


def build_dmv_schema(variant: str = "dmv") -> SchemaGraph:
    """One-table SchemaGraph for a DMV variant — no relationships, so
    ``spanning_tree(sg, 'dmv')`` is the edgeless UR tree (all weights
    1, join size = row count), exactly the reference's vtable-only DB
    (datasets.py:453-455: tables={}, just the universal relation)."""
    if variant not in DMV_VARIANTS:
        raise ValueError(f"unknown dmv variant {variant!r}; "
                         f"one of {sorted(DMV_VARIANTS)}")
    sg = SchemaGraph(variant)
    sg.add_table("dmv", size=1, col_names=DMV_VARIANTS[variant])
    return sg


def build_flight_delays_schema() -> SchemaGraph:
    """One-table SchemaGraph for flight-delays (reference
    datasets.py:561-571)."""
    sg = SchemaGraph("flight-delays")
    sg.add_table("flight_delays", size=1,
                 col_names=FLIGHT_DELAYS_COLUMNS)
    return sg


def _load_single(spark: SparkSession, data_dir: str, name: str,
                 file_name: str, columns: list[str],
                 casts: dict[str, str]) -> DataFrame:
    pq_path = os.path.join(data_dir, f"{name}.parquet")
    csv_path = os.path.join(data_dir, file_name)
    if os.path.exists(pq_path):
        df = spark.read.parquet(pq_path).select(
            *[F.col(f"`{c}`") for c in columns])
    elif os.path.exists(csv_path):
        df = load_csv_table(spark, csv_path, columns=columns)
    else:
        raise FileNotFoundError(
            f"{name}: neither {pq_path} nor {csv_path} exists")
    for c, typ in casts.items():
        if c in columns:
            df = df.withColumn(c, F.col(f"`{c}`").cast(typ))
    return df


def load_dmv(spark: SparkSession, data_dir: str,
             variant: str = "dmv",
             file_name: str = "dmv.csv") -> DataFrame:
    """The DMV relation for ``variant`` from ``data_dir`` — staged
    ``dmv.parquet`` (preferred) or the CSV export (headered,
    backslash-escaped; pass ``file_name='dmv-tiny.csv'`` for the
    reference's tiny fixture).  Keep-list projected at the source,
    ``Reg Valid Date`` cast to timestamp."""
    if variant not in DMV_VARIANTS:
        raise ValueError(f"unknown dmv variant {variant!r}; "
                         f"one of {sorted(DMV_VARIANTS)}")
    return _load_single(spark, data_dir, "dmv", file_name,
                        DMV_VARIANTS[variant], DMV_TYPE_CASTS)


def load_flight_delays(spark: SparkSession, data_dir: str,
                       file_name: str = "flight-delays.csv"
                       ) -> DataFrame:
    """The flight-delays relation from ``data_dir`` — staged
    ``flight_delays.parquet`` (preferred) or the CSV export;
    ``YEAR_DATE`` cast to float (the reference's pa.float32)."""
    return _load_single(spark, data_dir, "flight_delays", file_name,
                        FLIGHT_DELAYS_COLUMNS, FLIGHT_DELAYS_TYPE_CASTS)
