SELECT c_custkey AS doc_id,
  'Contact ' || chr(65 + (c_custkey % 26)::INT) || 'ohn ' || chr(65 + ((c_custkey*11) % 26)::INT) || 'mith'
  || ' <' || 'user' || c_custkey::VARCHAR || '@example.com' || '> or call '
  || '(415) 555-' || lpad(((c_custkey*7) % 10000)::VARCHAR, 4, '0')
  || '. Card ' || lpad(((c_custkey*7919) % 10000)::VARCHAR, 4, '0') || ' '
  || lpad(((c_custkey*104729) % 10000)::VARCHAR, 4, '0') || ' '
  || lpad(((c_custkey*1299709) % 10000)::VARCHAR, 4, '0') || ' '
  || lpad(((c_custkey*15485863) % 10000)::VARCHAR, 4, '0')
  || ' SSN ' || lpad((100 + c_custkey % 900)::VARCHAR, 3, '0') || '-'
  || lpad((10 + (c_custkey*3) % 90)::VARCHAR, 2, '0') || '-'
  || lpad((1000 + (c_custkey*7) % 9000)::VARCHAR, 4, '0')
  || ' IP 10.' || (c_custkey % 256)::VARCHAR || '.' || ((c_custkey*3) % 256)::VARCHAR || '.' || (1 + (c_custkey*7) % 254)::VARCHAR
  || ' MAC ' || substr(md5(c_custkey::VARCHAR),1,2) || ':' || substr(md5(c_custkey::VARCHAR),3,2) || ':' || substr(md5(c_custkey::VARCHAR),5,2) || ':' || substr(md5(c_custkey::VARCHAR),7,2) || ':' || substr(md5(c_custkey::VARCHAR),9,2) || ':' || substr(md5(c_custkey::VARCHAR),11,2)
  || ' Aadhaar ' || (2 + c_custkey % 8)::VARCHAR || lpad(((c_custkey*13) % 1000)::VARCHAR, 3, '0') || ' '
  || lpad(((c_custkey*37) % 10000)::VARCHAR, 4, '0') || ' ' || lpad(((c_custkey*91) % 10000)::VARCHAR, 4, '0')
  || ' PAN ' || (CASE WHEN c_custkey % 3 = 0
        THEN lower(chr(65 + (c_custkey % 26)::INT) || 'BCDE' || lpad((c_custkey % 10000)::VARCHAR, 4, '0') || chr(65 + ((c_custkey*5) % 26)::INT))
        ELSE chr(65 + (c_custkey % 26)::INT) || 'BCDE' || lpad((c_custkey % 10000)::VARCHAR, 4, '0') || chr(65 + ((c_custkey*5) % 26)::INT) END)
  || ' ' || (CASE WHEN c_custkey % 4 = 0 THEN 'DOB: ' ELSE 'on ' END)
  || '2024-' || lpad((1 + c_custkey % 12)::VARCHAR, 2, '0') || '-' || lpad((1 + (c_custkey*3) % 28)::VARCHAR, 2, '0') || '.'
  AS text
FROM customer
