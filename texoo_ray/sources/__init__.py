"""Sources: synthetic transcript generator and corpus readers."""
