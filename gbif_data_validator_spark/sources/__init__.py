"""Sources: testdata loaders, dimension tables, deterministic synthetic
web-page generator (the engine's fixtures — FIXTURES.md F1-F3)."""
