// Legacy CommonJS store kept for the migration period.
const fs = require('fs');
const path = require('path');

var DB_FILE = path.join(__dirname, 'tasks.jsonl');

function readAll() {
  const text = fs.readFileSync(DB_FILE, 'utf8');
  return text.split('\n').filter(Boolean).map(JSON.parse);
}

async function query(filter) {
  const rows = readAll();
  return rows.filter((row) => row.status === filter.status);
}

const save = function (rows) {
  fs.writeFileSync(DB_FILE, rows.map(JSON.stringify).join('\n'));
};

// wave-8 shape: a multi-line template literal holding SQL — its body
// (count(*), a decl-shaped line) is string DATA, never mentions
const REPORT_SQL = `
  SELECT status, count(*) AS n
  FROM tasks
  GROUP BY status
  function ghost() { leak(1); }
`;

function report(db) {
  return db.all(REPORT_SQL);
}

let counter = 0;

const nextId = () => {
  counter += 1;
  return counter;
};

module.exports = {query, save, nextId};
