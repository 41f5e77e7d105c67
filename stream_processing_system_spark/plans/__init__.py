"""Query plans: reference-parity queries + extended analytics."""
