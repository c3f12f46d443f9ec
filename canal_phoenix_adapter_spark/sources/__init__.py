"""Sources: testdata table loaders and the Canal event envelope."""
