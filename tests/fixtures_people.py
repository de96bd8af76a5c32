"""Generate the reference-faithful ``people`` fixture (FIXTURES.md §1).

Deterministic (seeded) people table with the required dirtiness: exact
duplicate rows, nulls in Phone (imputed to "Unknown"), nulls in other
columns (dropped by dropna), ISO date-of-birth strings spanning
1950-2024 so the flagship BETWEEN selects a strict subset.
"""

from __future__ import annotations

import random
from pathlib import Path

import pandas as pd

COLUMNS = [
    "Index",
    "User Id",
    "First Name",
    "Last Name",
    "Sex",
    "Email",
    "Phone",
    "Date of birth",
    "Job Title",
]

_FIRST = ["Alice", "Bob", "Carol", "David", "Eve", "Frank", "Grace", "Henry", "Ivy", "Jack"]
_LAST = ["Smith", "Jones", "Lee", "Brown", "Garcia", "Kim", "Patel", "Nguyen", "Silva", "Chen"]
_JOBS = ["Engineer", "Teacher", "Nurse", "Chef", "Pilot", "Artist", "Lawyer", "Farmer"]


def make_people(n: int = 1000, seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(1, n + 1):
        year = rng.randint(1950, 2024)
        dob = f"{year:04d}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        phone = None if rng.random() < 0.05 else f"{rng.randint(100,999)}.{rng.randint(100,999)}.{rng.randint(1000,9999)}"
        email = None if rng.random() < 0.02 else f"user{i}@example.com"
        rows.append(
            {
                "Index": i,
                "User Id": "".join(rng.choices("abcdef0123456789ABCDEF", k=15)),
                "First Name": rng.choice(_FIRST),
                "Last Name": rng.choice(_LAST),
                "Sex": rng.choice(["Male", "Female"]),
                "Email": email,
                "Phone": phone,
                "Date of birth": dob,
                "Job Title": rng.choice(_JOBS),
            }
        )
    # exact duplicates (exercise dropDuplicates + duplicate-count metric)
    for i in range(0, 20):
        rows.append(dict(rows[i * 7 % n]))
    rng.shuffle(rows)
    return pd.DataFrame(rows, columns=COLUMNS)


def write_people_fixture(dirpath: str | Path, n: int = 1000, seed: int = 42) -> tuple[str, str]:
    """Write people.csv (all-string path) and people.parquet (typed Index)."""
    dirpath = Path(dirpath)
    dirpath.mkdir(parents=True, exist_ok=True)
    pdf = make_people(n, seed)
    csv_path = dirpath / "people.csv"
    pq_path = dirpath / "people.parquet"
    pdf.to_csv(csv_path, index=False)
    pdf.astype({"Index": "int64"}).to_parquet(pq_path, index=False)
    return str(csv_path), str(pq_path)
