"""BFV scheme core (golden model import added once golden.py lands)."""
