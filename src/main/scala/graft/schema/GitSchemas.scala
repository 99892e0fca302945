package graft.schema

import ChType._

/** The reference's full table catalog as compile-time schemas
  * (SURVEY.md §1.3) — our analog of /root/reference/types.json +
  * /root/reference/create_db.py.
  *
  * Column order IS the TSV position contract: `commits.tsv` column c1 maps
  * to `commits.cols(0)`, etc. (/root/reference/types.json:6 reads
  * `c1::String AS hash …` positionally). The injected `repo_name` and
  * materialized `updated_at` are NOT part of the TSV shape — they are
  * appended by [[graft.sources.TsvIngest]] (types.json:6 `'{repo}'::String`,
  * types.json:7 `updated_at DateTime MATERIALIZED now()`).
  */
object GitSchemas {

  val fileChangeType: ChEnum8 = ChEnum8(Seq(
    "Add" -> 1, "Delete" -> 2, "Modify" -> 3,
    "Rename" -> 4, "Copy" -> 5, "Type" -> 6))

  val lineType: ChEnum8 = ChEnum8(Seq(
    "Empty" -> 0, "Comment" -> 1, "Punct" -> 2, "Code" -> 3))

  /** commits.tsv c1..c13 → git.commits (types.json:6-7; README.md:116-135). */
  val commits: Seq[Col] = Seq(
    Col("hash", ChString),
    Col("author", ChLowCardinality(ChString)),
    Col("time", ChDateTime),
    Col("message", ChString),
    Col("files_added", ChUInt32),
    Col("files_deleted", ChUInt32),
    Col("files_renamed", ChUInt32),
    Col("files_modified", ChUInt32),
    Col("lines_added", ChUInt32),
    Col("lines_deleted", ChUInt32),
    Col("hunks_added", ChUInt32),
    Col("hunks_removed", ChUInt32),
    Col("hunks_changed", ChUInt32))

  val commitsSortKey: Seq[String] = Seq("repo_name", "time", "hash")

  /** file_changes.tsv c1..c22 → git.file_changes (types.json:12-13;
    * README.md:137-168).
    */
  val fileChanges: Seq[Col] = Seq(
    Col("change_type", fileChangeType),
    Col("path", ChLowCardinality(ChString)),
    Col("old_path", ChLowCardinality(ChString)),
    Col("file_extension", ChLowCardinality(ChString)),
    Col("lines_added", ChUInt32),
    Col("lines_deleted", ChUInt32),
    Col("hunks_added", ChUInt32),
    Col("hunks_removed", ChUInt32),
    Col("hunks_changed", ChUInt32),
    Col("commit_hash", ChString),
    Col("author", ChLowCardinality(ChString)),
    Col("time", ChDateTime),
    Col("commit_message", ChString),
    Col("commit_files_added", ChUInt32),
    Col("commit_files_deleted", ChUInt32),
    Col("commit_files_renamed", ChUInt32),
    Col("commit_files_modified", ChUInt32),
    Col("commit_lines_added", ChUInt32),
    Col("commit_lines_deleted", ChUInt32),
    Col("commit_hunks_added", ChUInt32),
    Col("commit_hunks_removed", ChUInt32),
    Col("commit_hunks_changed", ChUInt32))

  val fileChangesSortKey: Seq[String] = Seq("repo_name", "time", "commit_hash", "path")

  /** line_changes.tsv c1..c37 → git.line_changes (types.json:18-19;
    * README.md:170-212).
    */
  val lineChanges: Seq[Col] = Seq(
    Col("sign", ChInt8),
    Col("line_number_old", ChUInt32),
    Col("line_number_new", ChUInt32),
    Col("hunk_num", ChUInt32),
    Col("hunk_start_line_number_old", ChUInt32),
    Col("hunk_start_line_number_new", ChUInt32),
    Col("hunk_lines_added", ChUInt32),
    Col("hunk_lines_deleted", ChUInt32),
    Col("hunk_context", ChLowCardinality(ChString)),
    Col("line", ChLowCardinality(ChString)),
    Col("indent", ChUInt8),
    Col("line_type", lineType),
    Col("prev_commit_hash", ChString),
    Col("prev_author", ChLowCardinality(ChString)),
    Col("prev_time", ChDateTime),
    Col("file_change_type", fileChangeType),
    Col("path", ChLowCardinality(ChString)),
    Col("old_path", ChLowCardinality(ChString)),
    Col("file_extension", ChLowCardinality(ChString)),
    Col("file_lines_added", ChUInt32),
    Col("file_lines_deleted", ChUInt32),
    Col("file_hunks_added", ChUInt32),
    Col("file_hunks_removed", ChUInt32),
    Col("file_hunks_changed", ChUInt32),
    Col("commit_hash", ChString),
    Col("author", ChLowCardinality(ChString)),
    Col("time", ChDateTime),
    Col("commit_message", ChString),
    Col("commit_files_added", ChUInt32),
    Col("commit_files_deleted", ChUInt32),
    Col("commit_files_renamed", ChUInt32),
    Col("commit_files_modified", ChUInt32),
    Col("commit_lines_added", ChUInt32),
    Col("commit_lines_deleted", ChUInt32),
    Col("commit_hunks_added", ChUInt32),
    Col("commit_hunks_removed", ChUInt32),
    Col("commit_hunks_changed", ChUInt32))

  val lineChangesSortKey: Seq[String] =
    Seq("repo_name", "time", "commit_hash", "path", "line_number_old", "line_number_new")
}
