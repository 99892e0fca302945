package graft.schema

import ChType._

/** `git.github_events` — the reference's largest declared schema
  * (/root/reference/create_db.py:67-128): the GH Archive event table behind
  * `github_stars_mv` (/root/reference/README.md:256-266). Every column,
  * Enum8 map, and Array type below transcribes that public DDL; this is the
  * parity contract itself (like [[GitSchemas]] for types.json).
  *
  * MergeTree `ORDER BY (event_type, repo_name, created_at)` — plain append
  * semantics (no Replacing/Summing), clustering via the sort key so Parquet
  * row-group stats skip on event_type/repo range predicates exactly where
  * ClickHouse's sparse primary index would.
  */
object GhEventsSchema {

  val eventType: ChEnum8 = ChEnum8(Seq(
    "CommitCommentEvent" -> 1, "CreateEvent" -> 2, "DeleteEvent" -> 3,
    "ForkEvent" -> 4, "GollumEvent" -> 5, "IssueCommentEvent" -> 6,
    "IssuesEvent" -> 7, "MemberEvent" -> 8, "PublicEvent" -> 9,
    "PullRequestEvent" -> 10, "PullRequestReviewCommentEvent" -> 11,
    "PushEvent" -> 12, "ReleaseEvent" -> 13, "SponsorshipEvent" -> 14,
    "WatchEvent" -> 15, "GistEvent" -> 16, "FollowEvent" -> 17,
    "DownloadEvent" -> 18, "PullRequestReviewEvent" -> 19,
    "ForkApplyEvent" -> 20, "Event" -> 21, "TeamAddEvent" -> 22))

  val action: ChEnum8 = ChEnum8(Seq(
    "none" -> 0, "created" -> 1, "added" -> 2, "edited" -> 3, "deleted" -> 4,
    "opened" -> 5, "closed" -> 6, "reopened" -> 7, "assigned" -> 8,
    "unassigned" -> 9, "labeled" -> 10, "unlabeled" -> 11,
    "review_requested" -> 12, "review_request_removed" -> 13,
    "synchronize" -> 14, "started" -> 15, "published" -> 16, "update" -> 17,
    "create" -> 18, "fork" -> 19, "merged" -> 20))

  val refType: ChEnum8 = ChEnum8(Seq(
    "none" -> 0, "branch" -> 1, "tag" -> 2, "repository" -> 3, "unknown" -> 4))

  val state: ChEnum8 = ChEnum8(Seq("none" -> 0, "open" -> 1, "closed" -> 2))

  val authorAssociation: ChEnum8 = ChEnum8(Seq(
    "NONE" -> 0, "CONTRIBUTOR" -> 1, "OWNER" -> 2, "COLLABORATOR" -> 3,
    "MEMBER" -> 4, "MANNEQUIN" -> 5))

  val mergeableState: ChEnum8 = ChEnum8(Seq(
    "unknown" -> 0, "dirty" -> 1, "clean" -> 2, "unstable" -> 3, "draft" -> 4))

  val reviewState: ChEnum8 = ChEnum8(Seq(
    "none" -> 0, "approved" -> 1, "changes_requested" -> 2, "commented" -> 3,
    "dismissed" -> 4, "pending" -> 5))

  private val lcStr = ChLowCardinality(ChString)
  private val lcArr = ChArray(lcStr)

  /** The full column list in DDL order (create_db.py:71-124). */
  val columns: Seq[Col] = Seq(
    Col("file_time", ChDateTime),
    Col("event_type", eventType),
    Col("actor_login", lcStr),
    Col("repo_name", lcStr),
    Col("created_at", ChDateTime),
    Col("updated_at", ChDateTime),
    Col("action", action),
    Col("comment_id", ChUInt64),
    Col("body", ChString),
    Col("path", ChString),
    Col("position", ChInt32),
    Col("line", ChInt32),
    Col("ref", lcStr),
    Col("ref_type", refType),
    Col("creator_user_login", lcStr),
    Col("number", ChUInt32),
    Col("title", ChString),
    Col("labels", lcArr),
    Col("state", state),
    Col("locked", ChUInt8),
    Col("assignee", lcStr),
    Col("assignees", lcArr),
    Col("comments", ChUInt32),
    Col("author_association", authorAssociation),
    Col("closed_at", ChDateTime),
    Col("merged_at", ChDateTime),
    Col("merge_commit_sha", ChString),
    Col("requested_reviewers", lcArr),
    Col("requested_teams", lcArr),
    Col("head_ref", lcStr),
    Col("head_sha", ChString),
    Col("base_ref", lcStr),
    Col("base_sha", ChString),
    Col("merged", ChUInt8),
    Col("mergeable", ChUInt8),
    Col("rebaseable", ChUInt8),
    Col("mergeable_state", mergeableState),
    Col("merged_by", lcStr),
    Col("review_comments", ChUInt32),
    Col("maintainer_can_modify", ChUInt8),
    Col("commits", ChUInt32),
    Col("additions", ChUInt32),
    Col("deletions", ChUInt32),
    Col("changed_files", ChUInt32),
    Col("diff_hunk", ChString),
    Col("original_position", ChUInt32),
    Col("commit_id", ChString),
    Col("original_commit_id", ChString),
    Col("push_size", ChUInt32),
    Col("push_distinct_size", ChUInt32),
    Col("member_login", lcStr),
    Col("release_tag_name", ChString),
    Col("release_name", ChString),
    Col("review_state", reviewState))

  /** MergeTree ORDER BY (create_db.py:126). */
  val sortKey: Seq[String] = Seq("event_type", "repo_name", "created_at")
}
