"""Sweep runner, CSV contracts, process measurement."""
