"""Pipeline compositions (read -> stages -> ordered write)."""
