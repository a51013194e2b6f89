"""HTTP surface: route contracts matching reference api/routes.py over a
dependency-free WSGI micro-framework (Flask is not a dependency here)."""
