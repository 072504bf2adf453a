"""Quicklooks and rate-distortion figures."""
