"""Independent numerical-parity oracle (pure NumPy).

See ``np_reference.py`` — re-implementations of the eight reference model
op graphs written directly from ``/root/reference/models/*.py``, sharing
only configs and weight values with the JAX path.
"""
