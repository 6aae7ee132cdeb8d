"""Shared importer machinery: per-locale label validation plug-in and
import statistics (parity: util/importers.py)."""

from __future__ import annotations

import argparse
import importlib
import os
import re
import sys
from collections import Counter
from typing import Optional


def get_counter() -> Counter:
    return Counter(
        {
            "all": 0,
            "failed": 0,
            "invalid_label": 0,
            "too_short": 0,
            "too_long": 0,
            "imported_time": 0,
            "total_time": 0,
        }
    )


def print_import_report(counter: Counter, sample_rate: int, max_secs: float) -> None:
    print(f"Imported {counter['all']} samples.")
    if counter["failed"] > 0:
        print(f"Skipped {counter['failed']} samples that failed upon conversion.")
    if counter["invalid_label"] > 0:
        print(
            f"Skipped {counter['invalid_label']} samples that failed on "
            "transcript validation."
        )
    if counter["too_short"] > 0:
        print(
            f"Skipped {counter['too_short']} samples that were too short to "
            "match the transcript."
        )
    if counter["too_long"] > 0:
        print(
            f"Skipped {counter['too_long']} samples that were longer than "
            f"{max_secs} seconds."
        )
    print(
        "Final amount of imported audio: "
        f"{counter['imported_time'] / sample_rate / 3600:.2f} h of "
        f"{counter['total_time'] / sample_rate / 3600:.2f} h."
    )


def get_importers_parser(description: str, **kwargs) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=description,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        **kwargs,
    )
    parser.add_argument(
        "--validate_label_locale",
        help="Path to a Python file defining a |validate_label| function "
        "for your locale.",
    )
    return parser


def get_validate_label(args):
    """Resolve the label-validation function: a user-supplied module with
    `validate_label`, defaulting to the English normalizer."""
    locale_path = getattr(args, "validate_label_locale", None)
    if locale_path is None:
        print(
            "WARNING: No --validate_label_locale specified, you might end "
            "with inconsistent dataset."
        )
        return validate_label_eng
    locale_path = str(locale_path)
    if not os.path.exists(os.path.abspath(locale_path)):
        print("ERROR: Path specified in --validate_label_locale is not a file.")
        return None
    sys.path.insert(1, os.path.abspath(os.path.dirname(locale_path)))
    module_name = os.path.basename(locale_path).replace(".py", "")
    return importlib.import_module(module_name).validate_label


def validate_label_eng(label: str) -> Optional[str]:
    """Normalize an English transcript to [a-z '] or reject it."""
    if re.search(r"[0-9]|[(<\[\]&*{]", label) is not None:
        return None
    label = label.replace("-", " ").replace("_", " ")
    label = re.sub("[ ]{2,}", " ", label)
    for ch in ".,;?!:\"":
        label = label.replace(ch, "")
    label = label.strip().lower()
    return label if label else None
