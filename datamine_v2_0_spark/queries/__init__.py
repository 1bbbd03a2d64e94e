"""Per-family contract query modules; assembled by contract.py."""
