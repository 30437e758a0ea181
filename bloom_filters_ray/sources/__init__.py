"""Sources: synthetic image+caption corpus and IO helpers."""
