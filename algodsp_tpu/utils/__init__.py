"""Shared utilities: elliptic-function math, polynomial root helpers."""
