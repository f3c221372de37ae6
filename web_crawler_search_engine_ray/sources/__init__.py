"""Sources: synthetic-web fixture generation and table I/O."""
