"""Ingestion-seam security gates, mirroring the reference's
`src/core/search/security.test.ts` coverage: traversal, encoded traversal,
system dirs, symlinks, scheme, host allowlist, URL shapes."""

from __future__ import annotations

import os

import pytest

from gistdex_spark.sources.security import (
    SecurityError,
    create_safe_path_validator,
    validate_external_url,
    validate_file_path,
    validate_gist_url,
    validate_github_repo_url,
)


@pytest.fixture()
def base(tmp_path):
    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "a.md").write_text("hi")
    (tmp_path / "top.txt").write_text("hi")
    return tmp_path


class TestValidateFilePath:
    def test_allows_files_within_base(self, base):
        out = validate_file_path("top.txt", str(base))
        assert out == os.path.realpath(str(base / "top.txt"))

    def test_allows_permitted_subdirectories(self, base):
        out = validate_file_path("docs/a.md", str(base))
        assert out.endswith("docs/a.md".replace("/", os.sep))

    def test_rejects_path_traversal(self, base):
        with pytest.raises(SecurityError) as e:
            validate_file_path("../outside.txt", str(base))
        assert e.value.code == "PATH_TRAVERSAL"

    def test_rejects_encoded_traversal(self, base):
        with pytest.raises(SecurityError) as e:
            validate_file_path("%2e%2e/outside.txt", str(base))
        assert e.value.code == "PATH_TRAVERSAL"

    def test_rejects_system_directories(self, base):
        for p in ("/etc/passwd", "/proc/self/environ", "/sys/kernel"):
            with pytest.raises(SecurityError) as e:
                validate_file_path(p, str(base))
            assert e.value.code == "SYSTEM_PATH_ACCESS"

    def test_rejects_paths_outside_allowed_bases(self, base, tmp_path_factory):
        other = tmp_path_factory.mktemp("elsewhere")
        (other / "x.txt").write_text("x")
        with pytest.raises(SecurityError) as e:
            validate_file_path(str(other / "x.txt"), str(base))
        assert e.value.code == "PATH_NOT_ALLOWED"

    def test_symlink_escaping_base_is_rejected(self, base, tmp_path_factory):
        outside = tmp_path_factory.mktemp("target")
        (outside / "secret.txt").write_text("s")
        link = base / "docs" / "link.txt"
        os.symlink(outside / "secret.txt", link)
        with pytest.raises(SecurityError) as e:
            validate_file_path("docs/link.txt", str(base))
        assert e.value.code == "PATH_NOT_ALLOWED"

    def test_rejects_empty_and_non_string(self, base):
        for bad in ("", None, 42):
            with pytest.raises(SecurityError) as e:
                validate_file_path(bad, str(base))
            assert e.value.code == "INVALID_PATH"

    def test_safe_path_validator_factory(self, base):
        check = create_safe_path_validator(str(base), (".", "./docs"))
        assert check("docs/a.md").endswith("a.md")
        with pytest.raises(SecurityError):
            check("../nope")


class TestValidateExternalUrl:
    def test_allows_github_domains(self):
        for url in (
            "https://github.com/apache/spark",
            "https://gist.github.com/u/0123abcd",
            "https://api.github.com/repos/a/b",
            "https://raw.githubusercontent.com/a/b/main/x.md",
        ):
            validate_external_url(url)  # no raise

    def test_rejects_non_https(self):
        with pytest.raises(SecurityError) as e:
            validate_external_url("http://github.com/a/b")
        assert e.value.code == "NON_HTTPS_URL"

    def test_rejects_other_domains(self):
        for url in (
            "https://gitlab.com/a/b",
            "https://evilgithub.com/a/b",  # suffix trick: not .github.com
        ):
            with pytest.raises(SecurityError) as e:
                validate_external_url(url)
            assert e.value.code == "DOMAIN_NOT_ALLOWED"

    def test_rejects_invalid_urls(self):
        for bad in ("", None, "not a url"):
            with pytest.raises(SecurityError):
                validate_external_url(bad)


class TestValidateGitHubRepoUrl:
    def test_parses_owner_repo(self):
        assert validate_github_repo_url("https://github.com/apache/spark") == {
            "owner": "apache",
            "repo": "spark",
        }
        assert validate_github_repo_url("https://github.com/a/b.git")["repo"] == "b"

    def test_rejects_short_paths(self):
        with pytest.raises(SecurityError) as e:
            validate_github_repo_url("https://github.com/apache")
        assert e.value.code == "INVALID_GITHUB_URL"

    def test_rejects_bad_names(self):
        with pytest.raises(SecurityError) as e:
            validate_github_repo_url("https://github.com/bad$owner/repo")
        assert e.value.code == "INVALID_GITHUB_NAME"


class TestValidateGistUrl:
    def test_parses_gist_id(self):
        gid = validate_gist_url("https://gist.github.com/someone/0123456789abcdef")
        assert gid == "0123456789abcdef"

    def test_rejects_non_gist_host(self):
        with pytest.raises(SecurityError) as e:
            validate_gist_url("https://github.com/a/b")
        assert e.value.code == "NOT_GIST_URL"

    def test_rejects_bad_id(self):
        with pytest.raises(SecurityError) as e:
            validate_gist_url("https://gist.github.com/nope")
        assert e.value.code == "INVALID_GIST_URL"


class TestSeamWiring:
    def test_parse_repo_url_rejects_non_allowlisted(self):
        from gistdex_spark.sources.github import parse_repo_url

        with pytest.raises(SecurityError):
            parse_repo_url("https://gitlab.com/a/b")
        with pytest.raises(SecurityError):
            parse_repo_url("http://github.com/a/b")

    def test_parse_gist_url_rejects_http(self):
        from gistdex_spark.sources.github import parse_gist_url

        with pytest.raises(SecurityError):
            parse_gist_url("http://gist.github.com/u/0123456789abcdef")

    def test_index_files_glob_prefix_gate(self, spark, tmp_path):
        from gistdex_spark.sources.indexer import index_files

        d = tmp_path / "data"
        d.mkdir()
        (d / "x.txt").write_text("hello world " * 50)
        # allowed: glob under the declared base
        df = index_files(spark, str(d / "*.txt"), base_dir=str(tmp_path))
        assert df.count() > 0
        # rejected: traversal in the glob
        with pytest.raises(SecurityError):
            index_files(spark, str(d) + "/../../*.txt", base_dir=str(tmp_path))
        # rejected: system prefix
        with pytest.raises(SecurityError):
            index_files(spark, "/etc/*.conf", base_dir=str(tmp_path))
