"""Reporting-layer query plans: analytics aggregations (A2-A7) and the
correction-file builder (P3/F10/F11)."""
