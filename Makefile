# Developer / CI entry points. Native oracle targets live in native/Makefile.

JAX_CACHE := /tmp/jax_cache
CACHE_TARBALL := ci_jax_cache.tgz

.PHONY: test-fast test-slow oracle goldens ci-cache-bake ci-cache-pack ci-cache-restore

test-fast:
	python -m pytest -m fast -q

test-slow:
	python -m pytest -m slow -q

oracle:
	$(MAKE) -C native

goldens:
	$(MAKE) -C native goldens

# --- CI compile-cache artifact (docs/CI.md) -------------------------------
# The fast tier is XLA:CPU-compile dominated (~18 min cold on a single-core
# box, minutes warm). Bake the persistent compile cache ONCE per
# (jax version x kernel-source revision), publish the tarball as a CI
# artifact, and restore it before running the tier on fresh boxes.

# Populate $(JAX_CACHE) by running the fast tier (one-time, slow).
ci-cache-bake:
	python -m pytest -m fast -q

# Tar the populated cache with a content key for artifact lookup.
ci-cache-pack:
	@test -d $(JAX_CACHE) || (echo "no $(JAX_CACHE); run make ci-cache-bake first" && exit 1)
	python - <<-'EOF'
	import hashlib, pathlib, subprocess, sys
	import jax
	h = hashlib.sha256(jax.__version__.encode())
	for p in sorted(pathlib.Path("planet_tpu").rglob("*.py")):
	    h.update(p.read_bytes())
	key = h.hexdigest()[:16]
	pathlib.Path("ci_cache_key.txt").write_text(key + "\n")
	print("cache key:", key)
	EOF
	tar czf $(CACHE_TARBALL) -C $(dir $(JAX_CACHE)) $(notdir $(JAX_CACHE))
	@echo "packed $(CACHE_TARBALL) ($$(du -h $(CACHE_TARBALL) | cut -f1)); key in ci_cache_key.txt"

# Restore a previously packed cache artifact (fresh checkout -> warm tier).
ci-cache-restore:
	@test -f $(CACHE_TARBALL) || (echo "no $(CACHE_TARBALL) artifact present" && exit 1)
	tar xzf $(CACHE_TARBALL) -C $(dir $(JAX_CACHE))
	@echo "restored $(JAX_CACHE) ($$(ls $(JAX_CACHE) | wc -l) entries)"
