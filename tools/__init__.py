"""Builder-side tooling: the local correctness-gate replica and the
baseline measurement harness. Importable so tests can reuse the gate's
comparison logic (tests/test_oracle_parity.py)."""
