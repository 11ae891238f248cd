"""Flatten a BIOSCAN-CLIP results.csv to one metric per row.

Parity with scripts/flattenCsv.py: splits the Metric column into
micro_macro/top_k and each Seen_*/Unseen_* column into
seen_unseen/taxon/value rows.
"""

from __future__ import annotations

import argparse
import csv
import sys

METRIC_VALUE_COLUMNS = [
    "Seen_Order", "Seen_Family", "Seen_Genus", "Seen_Species",
    "Unseen_Order", "Unseen_Family", "Unseen_Genus", "Unseen_Species",
]
METRIC_NAME_COLUMN = "Metric"


def flatten(rows, fieldnames):
    ignore = set(METRIC_VALUE_COLUMNS) | {METRIC_NAME_COLUMN}
    keep = [f for f in fieldnames if f not in ignore]
    out_fields = keep + ["micro_macro", "top_k", "seen_unseen", "taxon", "value"]
    out_rows = []
    for row in rows:
        base = {k: v for k, v in row.items() if k in keep}
        parts = row[METRIC_NAME_COLUMN].split("_")
        base["micro_macro"] = parts[0]
        base["top_k"] = parts[1].replace("Top-", "")
        for col in METRIC_VALUE_COLUMNS:
            r = dict(base)
            su, taxon = col.split("_")
            r["seen_unseen"] = su
            r["taxon"] = taxon
            r["value"] = row[col]
            out_rows.append(r)
    return out_rows, out_fields


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", type=argparse.FileType("w"),
                   default=sys.stdout)
    a = p.parse_args(argv)
    delim = "\t" if a.input.endswith(".tsv") else ","
    with open(a.input) as f:
        reader = csv.DictReader(f, delimiter=delim)
        rows = list(reader)
        fieldnames = reader.fieldnames
    out_rows, out_fields = flatten(rows, fieldnames)
    writer = csv.DictWriter(a.output, fieldnames=out_fields)
    writer.writeheader()
    writer.writerows(out_rows)


if __name__ == "__main__":
    main()
