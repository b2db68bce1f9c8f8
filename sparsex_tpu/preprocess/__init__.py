"""Host-side CSX preprocessing: substructure mining, statistics, encoding."""
