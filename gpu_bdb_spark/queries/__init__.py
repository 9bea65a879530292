"""Query registry package — see registry.py for the driver contract."""
