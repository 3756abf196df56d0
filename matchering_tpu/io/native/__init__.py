"""Native (C++) codec backend — built on demand, optional at runtime."""
