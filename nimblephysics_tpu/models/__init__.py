"""Model data structures and canonical world builders."""
