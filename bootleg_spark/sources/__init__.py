"""Sources: pages-table synthesis, entity-profile loading, dim tables."""
