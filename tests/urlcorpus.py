"""Adversarial URL corpus — one or more URLs per is_valid rule branch
(reference scraper.py:276-384) plus canonicalization edge cases."""

ADVERSARIAL_URLS = [
    # scheme rule (scraper.py:281-283)
    "ftp://www.ics.uci.edu/pub",
    "mailto:someone@ics.uci.edu",
    "http://www.ics.uci.edu/",
    "https://www.ics.uci.edu",
    "HTTPS://WWW.ICS.UCI.EDU/Path",  # urlparse lowercases scheme? (it does not for .scheme on mixed case? it does)
    # host allowlist (scraper.py:285-288)
    "https://ics.uci.edu/",
    "https://sub.ics.uci.edu/page",
    "https://notics.uci.edu/page",
    "https://ics.uci.edu.evil.com/page",
    "https://www.cs.uci.edu/research",
    "https://informatics.uci.edu/",
    "https://stat.uci.edu/courses",
    "https://www.stat.uci.edu./courses",  # trailing dot host
    "https://uci.edu/",
    "https://example.com/ics.uci.edu",
    # extension blacklist (scraper.py:294-296)
    "https://www.ics.uci.edu/file.pdf",
    "https://www.ics.uci.edu/file.PDF",
    "https://www.ics.uci.edu/file.pdf/",
    "https://www.ics.uci.edu/archive.tar.gz",
    "https://www.ics.uci.edu/pic.jpeg?x=1",
    "https://www.ics.uci.edu/script.js",
    "https://www.ics.uci.edu/data.txt",
    "https://www.ics.uci.edu/notes.html",
    "https://www.ics.uci.edu/file.pdfx",
    # calendar/event traps (scraper.py:298-308)
    "https://www.ics.uci.edu/events/day/2020-01-01",
    "https://www.ics.uci.edu/event/week/something",
    "https://www.ics.uci.edu/calendar/month/view",
    "https://www.ics.uci.edu/events/2020/05/",
    "https://www.ics.uci.edu/events/2021-07/",
    "https://www.ics.uci.edu/events/seminar/page/3/",
    "https://www.ics.uci.edu/events/list?tribe-bar-date=2021-02-03",
    "https://www.ics.uci.edu/events/?eventDisplay=past",
    "https://www.ics.uci.edu/events/seminar-talk",
    "https://www.ics.uci.edu/event/2019/12/31/talk",
    "https://www.ics.uci.edu/plain/2020/05/",  # date-ish but no /events|/calendar prefix
    # eppstein pix (scraper.py:310-311)
    "https://www.ics.uci.edu/~eppstein/pix/stuff",
    "https://www.ics.uci.edu/~eppstein/pixel",
    "https://www.cs.uci.edu/~eppstein/pix/stuff",
    # DokuWiki (scraper.py:313-315)
    "https://swiki.ics.uci.edu/doku.php?do=media&ns=x",
    "https://swiki.ics.uci.edu/doku.php?tab=files",
    "https://swiki.ics.uci.edu/doku.php?idx=start",
    "https://swiki.ics.uci.edu/doku.php?id=start",
    # wics galleries (scraper.py:317-323)
    "https://wics.ics.uci.edu/123456_abcd/",
    "https://wics.ics.uci.edu/123456_abcd_ef12_a/",
    "https://wics.ics.uci.edu/img_123/",
    "https://wics.ics.uci.edu/photo-4567/x",
    "https://wics.ics.uci.edu/12-34-event-2019/",
    "https://wics.ics.uci.edu/22-01-02-mentorship-night-22/",
    "https://wics.ics.uci.edu/normal-page/",
    # apache autoindex (scraper.py:325-326)
    "https://www.ics.uci.edu/dir/?C=N;O=A",
    "https://www.ics.uci.edu/dir/?c=m",
    "https://www.ics.uci.edu/dir/?F=2",
    "https://www.ics.uci.edu/dir/?o=d&x=1",
    # media param file (scraper.py:328-330)
    "https://www.ics.uci.edu/page?file=report.pdf",
    "https://www.ics.uci.edu/page?img=photo.jpg",
    "https://www.ics.uci.edu/page?attachment=deck.pptx",
    "https://www.ics.uci.edu/page?file=name",
    # ical export (scraper.py:332-333)
    "https://www.ics.uci.edu/events/x?ical=1",
    "https://www.ics.uci.edu/somepage?outlook-ical=99",
    # static calendar/gallery (scraper.py:335-336)
    "https://www.ics.uci.edu/about/calendar",
    "https://www.ics.uci.edu/about/calendar.html",
    "https://www.ics.uci.edu/dept/gallery/",
    "https://www.ics.uci.edu/galleryx",
    # wscacchi (scraper.py:338-339)
    "https://www.ics.uci.edu/~wscacchi/presentations/deck1",
    "https://www.ics.uci.edu/~wscacchi/GameLab/",
    "https://www.ics.uci.edu/~wscacchi/papers/p1",
    # mailman / instdav (scraper.py:341-345)
    "https://mailman.ics.uci.edu/listinfo",
    "https://instdav.ics.uci.edu/anything",
    # mlphysics data (scraper.py:347-348)
    "https://mlphysics.ics.uci.edu/data/set1",
    "https://mlphysics.ics.uci.edu/papers/data/",
    "https://mlphysics.ics.uci.edu/dataset",
    # grape (scraper.py:350-355)
    "https://grape.ics.uci.edu/wiki/asterix/page",
    "https://grape.ics.uci.edu/wiki/timeline",
    "https://grape.ics.uci.edu/wiki/public?action=diff",
    "https://grape.ics.uci.edu/wiki/public?format=txt",
    "https://grape.ics.uci.edu/wiki/public",
    # deep path pagination (scraper.py:357-358)
    "https://www.ics.uci.edu/blog/page/123/",
    "https://www.ics.uci.edu/blog/page/12/",
    "https://www.ics.uci.edu/blog/pagination/5000",
    # trap keywords (scraper.py:360-362)
    "https://www.ics.uci.edu/wp-json/wp/v2",
    "https://www.ics.uci.edu/page?share=twitter",
    "https://www.ics.uci.edu/README",
    "https://www.ics.uci.edu/project/demo",
    "https://www.ics.uci.edu/login",
    "https://www.ics.uci.edu/x?replytocom=5",
    "https://www.ics.uci.edu/feedback",  # contains "feed" substring
    "https://www.ics.uci.edu/safe-page",
    # query pagination (scraper.py:364-366)
    "https://www.ics.uci.edu/list?page=500",
    "https://www.ics.uci.edu/list?page=50",
    "https://www.ics.uci.edu/list?offset=1000&limit=10",
    "https://www.ics.uci.edu/list?start=123",
    # repeating segments (scraper.py:368-373)
    "https://www.ics.uci.edu/a/b/a/b/a/b",
    "https://www.ics.uci.edu/a/a/a/a/a/a",
    "https://www.ics.uci.edu/x/y/z/x/y/z",
    "https://www.ics.uci.edu/a/b/c/a/b/d",
    "https://www.ics.uci.edu/a/b/a/b",  # only 4 segments -> allowed
    # length limits (scraper.py:375-377)
    "https://www.ics.uci.edu/" + "x" * 2100,
    "https://www.ics.uci.edu/ok?" + "q" * 650,
    "https://www.ics.uci.edu/" + "/".join(f"s{i}" for i in range(25)),
    # parse edge cases (exception path scraper.py:381-384)
    "https://www.ics.uci.edu:not_a_port/x",
    "",
    "http://",
    "https://www.ics.uci.edu/%zz",
    "https://www.ics.uci.edu/page with space",
    # canonicalization edges
    "https://www.ics.uci.edu/page#section",
    "https://www.ics.uci.edu/page?a=1#frag",
    "https://www.ics.uci.edu/page///",
    "https://www.ics.uci.edu/page;params?q=1#f",
    "http://www.ics.uci.edu/page",
]
