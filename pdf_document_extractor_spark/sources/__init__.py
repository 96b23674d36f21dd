"""Sources/sinks: pages-table readers, synthesis, snapshot catalog."""
