"""Analytic plans: views (V-base/V-aggm/V-agga) and queries (Q1-Q7)."""
