"""Sources: synthetic documents-table generator, fixture loaders, IO helpers."""
