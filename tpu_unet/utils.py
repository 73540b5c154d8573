"""Small shared utilities (the utils/utils.py counterpart)."""
from __future__ import annotations


def show_config(**kwargs):
    """Pretty-print hyperparameters (reference: utils/utils.py:68-75)."""
    print("Configurations:")
    print("-" * 70)
    print("|%25s | %40s|" % ("keys", "values"))
    print("-" * 70)
    for key, value in kwargs.items():
        print("|%25s | %40s|" % (str(key), str(value)))
    print("-" * 70)
