"""Populated in M1."""
